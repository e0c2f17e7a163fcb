"""OptimizationProblem traffic tests: constraint dedup on insert and the
prune-and-reoptimize path, exercised with real constraint objects (the
machinery the multi-closure benchmark drives on hardware).

Mirrors ``OptimizationProblem.cpp:177-189`` (dedup) and Open3D's
``CreatePoseGraphWithoutInvalidEdges`` two-stage pruning.
"""
import numpy as np

from open3d_slam_tpu.models.constraints import Constraint
from open3d_slam_tpu.models.optimization import OptimizationProblem
from open3d_slam_tpu.utils.config import MapperParameters


def _T(x=0.0, y=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:2, 3] = [x, y]
    return T


def _lc(src, tgt, T=None, info_scale=1.0, t=0.0):
    return Constraint(source_submap_idx=src, target_submap_idx=tgt,
                      source_to_target=T if T is not None else np.eye(4),
                      information_matrix=np.eye(6) * info_scale,
                      is_odometry_constraint=False,
                      is_information_matrix_valid=True, timestamp=t)


def _odo(src, T):
    return Constraint(source_submap_idx=src, target_submap_idx=src + 1,
                      source_to_target=T, information_matrix=np.eye(6) * 100.0,
                      is_odometry_constraint=True,
                      is_information_matrix_valid=True)


def test_loop_closure_constraint_dedup():
    """Same (source, target) pair inserted twice keeps ONE constraint
    (OptimizationProblem.cpp:177-189), including across separate inserts."""
    prob = OptimizationProblem(MapperParameters())
    prob.insert_loop_closure_constraints([_lc(5, 0), _lc(5, 0), _lc(6, 1)])
    assert len(prob.loop_closure_constraints) == 2
    prob.insert_loop_closure_constraints([_lc(5, 0, _T(0.3))])
    assert len(prob.loop_closure_constraints) == 2
    # A different pair still inserts.
    prob.insert_loop_closure_constraints([_lc(7, 2)])
    assert len(prob.loop_closure_constraints) == 3


def test_prune_drops_bogus_closure_and_reoptimizes():
    """A wildly inconsistent uncertain edge is pruned (line-process weight
    below edge_prune_threshold), the consistent closure survives, and a
    SECOND solve with fresh constraints runs on the pruned graph."""
    p = MapperParameters()
    prob = OptimizationProblem(p)
    # 6-node chain with 1 m x-steps (source_to_target maps source into
    # target frame; the builder chains node poses from these).
    step = _T(x=-1.0)
    odo = [_odo(i, step) for i in range(5)]
    prob.insert_odometry_constraints(odo)
    good = _lc(5, 0, _T(x=5.0), info_scale=10.0, t=1.0)   # consistent: node5 at x=5
    bogus = _lc(4, 1, _T(x=40.0, yaw=2.0), info_scale=10.0, t=2.0)
    prob.insert_loop_closure_constraints([good, bogus])

    class FakeSubmaps:
        pass

    prob.build_optimization_problem(FakeSubmaps())
    assert len(prob.node_poses) == 6
    prob.solve()
    assert prob.num_edges_pruned_last_solve >= 1
    kept_pairs = {(c.source_submap_idx, c.target_submap_idx)
                  for c in prob.loop_closure_constraints}
    assert (5, 0) in kept_pairs
    assert (4, 1) not in kept_pairs
    incs = prob.get_optimized_transform_increments()
    assert len(incs) == 6
    assert all(np.isfinite(i.dT).all() for i in incs)

    # Re-optimize round: one more odometry edge + a fresh closure.
    prob.insert_odometry_constraints([_odo(5, step)])
    prob.insert_loop_closure_constraints([_lc(6, 1, _T(x=5.0),
                                              info_scale=10.0, t=3.0)])
    prob.build_optimization_problem(FakeSubmaps())
    prob.solve()
    assert len(prob.node_poses) == 7
    assert all(np.isfinite(P).all() for P in prob.node_poses_optimized)
