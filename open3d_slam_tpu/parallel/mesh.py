"""Device mesh helpers for multi-chip scaling.

The reference has NO distributed computing (4 pthreads on one host,
SURVEY §2.4); this package adds the TPU-native scale-out axes:
  * ``data``  — independent work items (scan pairs, sequences, hypotheses);
  * ``block`` — correspondence blocks of one registration (point shards whose
    6x6 JtJ / Jtr are psum-reduced over ICI each GN iteration).

Meshes are built with ``jax.make_mesh``; on multi-host deployments call
``jax.distributed.initialize()`` first and the same code runs over ICI+DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "block")) -> Mesh:
    """2D (data, block) mesh over all available devices.

    Default shape: all devices on the data axis, block=1 (pure batch
    parallelism); pass e.g. (2, 4) to split 8 chips into 2-way batch x 4-way
    correspondence-block sharding.
    """
    n = len(jax.devices())
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    # Auto axes: let XLA propagate shardings (GSPMD).  JAX 0.9's default
    # Explicit sharding-in-types breaks while_loop batching rules.
    from jax.sharding import AxisType
    return jax.make_mesh(shape, axis_names,
                         axis_types=tuple(AxisType.Auto for _ in axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch axis onto the data axis."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
