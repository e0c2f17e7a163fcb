"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is validated on virtual CPU devices; real-TPU
benchmarking happens in bench.py, not in tests.
"""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"  # force off the axon TPU tunnel for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override it at the config level.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
