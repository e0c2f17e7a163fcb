"""Multi-host (multi-process) harness: BASELINE config 5 / SURVEY §2.4.

Spawns REAL separate processes with ``jax.distributed.initialize`` over a
local coordinator — 2 processes x 4 virtual CPU devices — and runs the
globally-sharded registration + pose-graph refinement stages.  This is the
N>=2-host axis the reference does not have.
"""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_multihost_pass(tmp_path):
    out = tmp_path / "multihost.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "open3d_slam_tpu.parallel.multihost",
         "--spawn", "2", "--block", "2", "--coordinator", "localhost:12817",
         "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "multihost: PASS" in proc.stdout
    result = json.loads(out.read_text())
    assert result["processes"] == 2
    assert result["global_devices"] == 8
    assert result["mesh"] == {"data": 4, "block": 2}
    assert result["registration_fitness"] > 0.95
    assert result["pose_graph_endpoint_err"] < 0.05
    # BASELINE config-5 stage: every process got all N batch-mapped
    # trajectories (sequences are round-robin-owned, allgather-merged).
    bm = result["batch_map_sequences"]
    assert bm["n_nonzero"] == bm["n_sequences"] == 2
    assert bm["max_start_err"] < 1e-3
