"""Pallas radius-moments normals kernel: interpret-mode correctness vs NumPy
PCA and vs the probe path (VERDICT r1 weak-item #1).

The flash kernel is the DEFAULT normals path on TPU (``normals.estimate_normals
method='auto'``); these tests pin its semantics on the CPU interpreter:
  * raw moments (count / sums / second moments) == NumPy reference;
  * covariances -> normals == NumPy PCA normals (angle < 1e-3 rad);
  * flash-vs-probe agreement when probe's max_nn cap is not binding;
  * the documented deviation (no max_nn cap) is bounded on plane data.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.ops import normals as normals_ops, pallas_normals
from open3d_slam_tpu.utils import pointcloud as pclib


def numpy_radius_moments(points, mask, radius):
    """Reference: neighborhoods = ALL valid points with |pi-pj| <= r,
    in centroid-centered coordinates (kernel semantics)."""
    pts = points[mask]
    centroid = pts.mean(axis=0)
    c = points - centroid
    n = points.shape[0]
    cnt = np.zeros(n)
    s1 = np.zeros((n, 3))
    s2 = np.zeros((n, 6))
    for i in range(n):
        d2 = np.sum((c - c[i]) ** 2, axis=1)
        nb = (d2 <= radius * radius) & mask
        cnt[i] = nb.sum()
        q = c[nb]
        s1[i] = q.sum(axis=0)
        xx = (q[:, 0] * q[:, 0]).sum(); xy = (q[:, 0] * q[:, 1]).sum()
        xz = (q[:, 0] * q[:, 2]).sum(); yy = (q[:, 1] * q[:, 1]).sum()
        yz = (q[:, 1] * q[:, 2]).sum(); zz = (q[:, 2] * q[:, 2]).sum()
        s2[i] = [xx, xy, xz, yy, yz, zz]
    return cnt, s1, s2


def numpy_pca_normal(points, mask, radius, i):
    d2 = np.sum((points - points[i]) ** 2, axis=1)
    nb = (d2 <= radius * radius) & mask
    q = points[nb]
    if len(q) < 3:
        return np.array([0.0, 0.0, 1.0])
    cov = np.cov(q.T, bias=True)
    w, v = np.linalg.eigh(cov)
    return v[:, 0]


def test_radius_moments_interpret_vs_numpy(rng):
    n = 256
    pts = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[240:] = False  # some padding
    radius = 1.2
    mom = np.asarray(pallas_normals.radius_moments(
        jnp.asarray(pts), jnp.asarray(mask), radius,
        block_m=64, block_n=128, interpret=True))
    cnt_ref, s1_ref, s2_ref = numpy_radius_moments(pts, mask, radius)
    np.testing.assert_allclose(mom[:, 0], cnt_ref, atol=0)
    np.testing.assert_allclose(mom[:, 1:4], s1_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(mom[:, 4:10], s2_ref, rtol=1e-3, atol=5e-3)


def test_flash_normals_vs_numpy_pca(rng):
    """Full flash path (interpret) vs per-point NumPy PCA normals."""
    n = 256
    # LiDAR-like: two planes + noise.
    ground = np.stack([rng.uniform(-4, 4, 160), rng.uniform(-4, 4, 160),
                       np.zeros(160)], axis=1)
    wall = np.stack([np.full(96, 2.0), rng.uniform(-4, 4, 96),
                     rng.uniform(0, 3, 96)], axis=1)
    pts = np.concatenate([ground, wall]).astype(np.float32)
    pts += rng.normal(scale=0.005, size=pts.shape).astype(np.float32)
    pc = pclib.from_numpy(pts, capacity=n)
    radius = 0.8
    # max_nn larger than any neighborhood -> pure radius search, matching
    # the uncapped NumPy reference.
    out = normals_ops.estimate_normals(pc, radius, max_nn=n, method="flash",
                                       interpret=True)
    nrm = np.asarray(out.normals)
    mask = np.asarray(pc.mask)
    bad = 0
    for i in range(0, n, 7):
        if not mask[i]:
            continue
        ref = numpy_pca_normal(pts, mask[:len(pts)], radius, i)
        dot = abs(float(np.dot(nrm[i], ref)))
        if dot < 0.999:  # ~2.5 deg
            bad += 1
    assert bad <= 1, f"{bad} normals deviate from NumPy PCA"


def test_flash_vs_probe_parity(rng):
    """When probe's max_nn cap is NOT binding, flash == probe (both = full
    radius neighborhood PCA)."""
    n = 256
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts, capacity=n)
    radius = 1.0  # sparse cloud -> few neighbors, far below max_nn=64
    flash = normals_ops.estimate_normals(pc, radius, max_nn=64, method="flash",
                                         interpret=True)
    probe = normals_ops.estimate_normals(pc, radius, max_nn=64,
                                         bucket_size=32, method="probe")
    nf = np.asarray(flash.normals)
    np_ = np.asarray(probe.normals)
    dots = np.abs(np.sum(nf * np_, axis=1))
    assert np.mean(dots > 0.999) > 0.97, f"parity {np.mean(dots > 0.999)}"


def test_flash_hybrid_max_nn_exact(rng):
    """Flash now implements EXACT hybrid (radius, max_nn) via the k-th-NN
    distance prepass: neighborhood counts must equal the NumPy hybrid
    reference even where max_nn caps hard."""
    n = 512
    pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
                    rng.normal(scale=0.01, size=n)], axis=1).astype(np.float32)
    radius, k = 1.5, 10  # dense: ~50+ pts in radius, max_nn=10 caps hard
    mask = np.ones(n, bool)
    dk2 = np.asarray(pallas_normals.kth_neighbor_d2(
        jnp.asarray(pts), jnp.asarray(mask), k))
    r_pp = np.asarray(pallas_normals.hybrid_radius(radius, jnp.asarray(dk2)))
    mom = np.asarray(pallas_normals.radius_moments(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(r_pp),
        block_m=64, block_n=128, interpret=True))
    # Reference: k nearest (self included) within radius; the epsilon-inflated
    # cap may keep ties just beyond d_k, so allow [strict, strict+ties].
    for i in range(0, n, 31):
        d2 = np.sum((pts - pts[i]) ** 2, axis=1)
        cap = min(radius ** 2, np.sort(d2)[k - 1])
        lo = (d2 <= cap).sum()
        hi = (d2 <= cap * (1 + 3e-5)).sum()
        assert lo <= mom[i, 0] <= hi, (i, lo, mom[i, 0], hi)
    # The capped neighborhoods still recover the z plane.
    pc = pclib.from_numpy(pts, capacity=n)
    flash = normals_ops.estimate_normals(pc, radius, max_nn=k,
                                         method="flash", interpret=True)
    z = np.abs(np.asarray(flash.normals)[:, 2])
    assert float(np.median(z)) > 0.999


def test_estimate_normals_at_subset_equals_full(rng):
    """Normals at a query SUBSET with full-cloud support must equal the
    full-cloud estimate restricted to those rows (the downsample-then-
    estimate reorder of the preprocess chain is exact)."""
    n, m = 512, 128
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                    rng.normal(scale=0.02, size=n)], axis=1).astype(np.float32)
    support = pclib.from_numpy(pts, capacity=n)
    sel = rng.choice(n, m, replace=False)
    queries = pclib.from_numpy(pts[sel], capacity=m)

    # Probe path (CPU): exact row-wise equality.
    full = normals_ops.estimate_normals(support, 1.0, max_nn=12,
                                        method="probe")
    sub = normals_ops.estimate_normals_at(queries, support, 1.0, max_nn=12,
                                          method="probe")
    np.testing.assert_allclose(np.asarray(sub.normals),
                               np.asarray(full.normals)[sel], atol=1e-5)

    # Flash path (interpret): same planes as the probe subset.
    flash = normals_ops.estimate_normals_at(
        queries, support, 1.0, max_nn=12, method="flash", interpret=True)
    dots = np.abs(np.sum(np.asarray(flash.normals) *
                         np.asarray(sub.normals), axis=1))
    assert float(np.median(dots)) > 0.999
