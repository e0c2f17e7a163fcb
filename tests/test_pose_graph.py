"""Pose-graph optimization tests: loop-closure correction recovery."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from open3d_slam_tpu.ops import pose_graph
from open3d_slam_tpu.utils import se3


def make_graph(node_poses, edges, n_cap=16, e_cap=32):
    N = len(node_poses)
    E = len(edges)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_cap, 1, 1))
    poses[:N] = np.stack(node_poses)
    src = np.zeros(e_cap, np.int32)
    tgt = np.zeros(e_cap, np.int32)
    T = np.tile(np.eye(4, dtype=np.float32), (e_cap, 1, 1))
    info = np.tile(np.eye(6, dtype=np.float32), (e_cap, 1, 1))
    unc = np.zeros(e_cap, bool)
    emask = np.zeros(e_cap, bool)
    for i, (s, t, Te, inf_scale, uncertain) in enumerate(edges):
        src[i], tgt[i] = s, t
        T[i] = Te
        info[i] = np.eye(6) * inf_scale
        unc[i] = uncertain
        emask[i] = True
    nmask = np.zeros(n_cap, bool)
    nmask[:N] = True
    return pose_graph.PoseGraphData(
        node_poses=jnp.asarray(poses), node_mask=jnp.asarray(nmask),
        edge_source=jnp.asarray(src), edge_target=jnp.asarray(tgt),
        edge_transform=jnp.asarray(T), edge_information=jnp.asarray(info),
        edge_uncertain=jnp.asarray(unc), edge_mask=jnp.asarray(emask))


def rt(yaw, x, y):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
    T[:3, 3] = [x, y, 0]
    return T


def test_chain_with_perfect_edges_stays_put():
    # Nodes at ground truth, edges consistent -> optimization is a no-op.
    nodes = [rt(0, 0, 0), rt(0, 1, 0), rt(0, 2, 0)]
    edges = []
    for i in range(2):
        Te = np.linalg.inv(nodes[i]) @ nodes[i + 1]
        edges.append((i, i + 1, Te, 1.0, False))
    g = make_graph(nodes, edges)
    X, w, pruned = pose_graph.optimize(g, 10.0, 2.0, 0.25, 0, max_iterations=10)
    X = np.asarray(X)
    for i in range(3):
        np.testing.assert_allclose(X[i], nodes[i], atol=1e-4)


def test_loop_closure_spreads_drift():
    """Chain with accumulated drift + one loop-closure edge back to start.

    The optimizer must pull the last node toward the loop-closure estimate.
    """
    n = 6
    gt = [rt(0, float(i), 0) for i in range(n)]
    # Odometry edges with a consistent bias in x (drift).
    drift = 0.1
    nodes = [np.eye(4)]
    for i in range(1, n):
        T = nodes[-1] @ rt(0, 1.0 + drift, 0)
        nodes.append(T)
    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1, rt(0, 1.0 + drift, 0), 1.0, False))
    # Loop closure: node n-1 observed at its TRUE pose relative to node 0.
    T_lc = np.linalg.inv(gt[0]) @ gt[n - 1]
    edges.append((0, n - 1, T_lc, 10.0, True))
    g = make_graph(nodes, edges)
    X, w, pruned = pose_graph.optimize(g, 10.0, 2.0, 0.25, 0, max_iterations=30)
    X = np.asarray(X)
    # End node moved toward ground truth (drift 0.5 -> much smaller).
    err_before = np.linalg.norm(nodes[n - 1][:3, 3] - gt[n - 1][:3, 3])
    err_after = np.linalg.norm(X[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert err_before > 0.45
    assert err_after < 0.15, f"err after {err_after}"
    # Loop-closure weight stays high (consistent edge).
    assert float(w[n - 1]) > 0.5
    # Reference node pinned.
    np.testing.assert_allclose(X[0], np.eye(4), atol=1e-3)


def test_bogus_loop_closure_downweighted():
    """An inconsistent loop-closure edge must get a small line-process weight
    and barely move the chain."""
    n = 5
    nodes = [rt(0, float(i), 0) for i in range(n)]
    edges = [(i, i + 1, rt(0, 1, 0), 100.0, False) for i in range(n - 1)]
    # Bogus LC: claims node 4 is at the origin (5 m error, tight info).
    edges.append((0, n - 1, rt(0.5, 0.1, 3.0), 100.0, True))
    g = make_graph(nodes, edges)
    X, w, pruned = pose_graph.optimize(g, 0.5, 2.0, 0.25, 0, max_iterations=30)
    X = np.asarray(X)
    assert float(w[n - 1]) < 0.25  # pruned by line process
    # Two-stage prune (Open3D GlobalOptimization behavior): the bogus edge is
    # flagged pruned and has zero weight in the re-optimized graph.
    assert bool(np.asarray(pruned)[n - 1])
    assert not np.asarray(pruned)[:n - 1].any()  # odometry edges never pruned
    assert float(w[n - 1]) == 0.0
    err = np.linalg.norm(X[n - 1][:3, 3] - nodes[n - 1][:3, 3])
    # Trajectory recovers fully after the pruned re-optimization.
    assert err < 0.05, f"bogus LC dragged the chain by {err}"


def test_information_matrix_shape():
    q = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32))
    mask = jnp.ones(100, bool)
    info = pose_graph.information_matrix_from_correspondences(q, mask)
    info = np.asarray(info)
    assert info.shape == (6, 6)
    # Symmetric PSD.
    np.testing.assert_allclose(info, info.T, atol=1e-3)
    assert np.all(np.linalg.eigvalsh(info) > -1e-3)
    # Translation block = N * I.
    np.testing.assert_allclose(info[3:, 3:], 100 * np.eye(3), atol=1e-3)
