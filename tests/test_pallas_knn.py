"""Pallas flash-NN kernel: interpret-mode correctness (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from jax.experimental import pallas as pl


@pytest.fixture
def interpreted_knn(monkeypatch):
    """Reload pallas_knn with interpret=True pallas_call."""
    import importlib
    from open3d_slam_tpu.ops import pallas_knn as mod
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    importlib.reload(mod)
    yield mod
    monkeypatch.setattr(pl, "pallas_call", orig)
    importlib.reload(mod)


def test_nn_argmin_matches_kdtree(interpreted_knn, rng):
    M, N = 512, 4096
    q = rng.uniform(-10, 10, (M, 3)).astype(np.float32)
    t = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
    t2 = (t ** 2).sum(1)
    idx, d2 = interpreted_knn.nn_argmin(
        jnp.asarray(q), jnp.asarray(t.T), jnp.asarray(t2[None, :]),
        block_m=256, block_n=1024)
    idx = np.asarray(idx)
    dref, _ = cKDTree(t).query(q, k=1)
    d_got = np.linalg.norm(t[idx] - q, axis=1)
    np.testing.assert_allclose(d_got, dref, atol=1e-3)


def test_nn_argmin_respects_mask(interpreted_knn, rng):
    M, N = 256, 2048
    q = rng.uniform(-5, 5, (M, 3)).astype(np.float32)
    t = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[::2] = False  # half invalid
    t2 = (t ** 2).sum(1)
    t2[~valid] = np.inf
    idx, _ = interpreted_knn.nn_argmin(
        jnp.asarray(q), jnp.asarray(t.T), jnp.asarray(t2[None, :]),
        block_m=256, block_n=1024)
    assert valid[np.asarray(idx)].all()
