"""Persistent XLA compilation cache for CLI/bench entry points.

The SLAM pipeline jit-compiles ~a dozen static-shape programs (preprocess,
scan2scan/scan2map ICP, submap insert, dense map, features, pose graph).  On
the tunneled TPU backend each compile costs 20-90 s; with the persistent
cache a repeat run (same capacities) loads them in milliseconds.  Library
code never calls this — only executables (CLI, bench) opt in.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "O3D_SLAM_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "o3d_slam_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # unsupported backend/flag -> cache is best-effort
        print(f"[o3d_slam_tpu] persistent XLA cache unavailable: {e}")
