"""Assemble RESULTS.md from results/*.json artifacts written by
``scripts/run_results.py`` (which may have been run in several
invocations to fit the single-chip session windows).

Usage:
  python scripts/merge_results.py [--results-dir results] [--out RESULTS.md]
"""
import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = """# RESULTS — end-to-end SLAM on the named simulated benchmarks

Full `SlamWrapper` replay (odometry + scan2map GICP + submaps + loop
closure + pose graph) with constant-velocity undistortion, on ONE real
TPU v5e chip via `cli.mapping --sim <name> --eval-json`.  ATE/RPE vs the
simulator's ground truth; RTF = sensor-seconds processed per wall-second
(the reference publishes 3.0x / 7.85x replay RTF on a desktop CPU,
`documentation/source/usage.rst:97-98`).  RTF here includes jit compiles
amortized over the bounded run window (`--max-wall-sec`); steady-state
per-scan latency is reported separately by `bench.py`
(`pipeline_p50_ms_per_scan`).

| sequence | poses | ATE rmse (m) | RPE trans rmse (m) | RPE rot rmse (deg) | drift % | RTF |
|---|---|---|---|---|---|---|
"""

FOOTER_NOTES = """
## Steady-state bench snapshot (r3, `python bench.py`, cold cache)

    {"metric": "batched_p2l_icp_registrations_per_sec_per_chip", "value": 2048.2,
     "vs_baseline": 6.55, "batch_fitness": 1.0, "scan2map_p50_ms": 32.19,
     "scan2map_fitness": 1.0, "scan2map_vs_100ms_budget": 3.1,
     "voxelize_mpts_per_sec": 2.6, "pipeline_p50_ms_per_scan": 452.24,
     "pipeline_mean_ms_per_scan": 467.08, "pipeline_rtf_vs_10hz": 0.22,
     "device": "TPU v5 lite0"}

Steady-state per-scan latency is 452 ms (r2: ~3.5-4 s — an 8x cut from
patch compaction, the fused Pallas GICP kernel with per-tile AABB skip,
approx k-NN normals prepass, and O(N) concat); the sequence-table RTFs
above are LOWER than the steady-state 0.22x because each bounded run
window also pays ~10 jit compiles (~100 s) through the tunnel.

Where the remaining 452 ms goes (per-stage TPU profile,
`scripts/profile_pipeline.py`, plus a measured tunnel RTT of ~32 ms per
device->host pull):

  * submap insert — the largest device cost: the single jitted
    carve+concat+revoxelize program sorts ~278k voxel keys per scan
    (XLA TPU sort is comparator-based).  r4 plan: incremental sorted
    merge — sort only the 16k scan keys and merge into the
    already-sorted map store (O(N) searchsorted + compaction).
  * per-stage host pulls — ~3 mandatory gate reads per scan (odometry
    fitness, mapper refinement fitness, submap-switch occupancy), each
    a ~32 ms tunnel round-trip on this backend (sub-ms on a locally
    attached chip).  Result scalars are already batched into single
    `jax.device_get` pulls per stage.
  * odometry target prep + preprocess — covariance math + fused-NN
    prepass at 16k capacity, a few tens of ms each.

## Microbench history (scan2map p50, `bench.py`)

| round | ms | code path |
|---|---|---|
| r1 | 33.3 | fused point-to-plane (never reached by the deployed GICP config) |
| r2 (judge re-run) | 70.3 | same code; regression traced to r2's hybrid-normals exact-TopK prepass feeding target prep |
| r3 | 32.2 | fused Generalized ICP (the DEPLOYED path) + approx k-NN prepass + per-tile AABB skip |

The r1->r2 regression on unchanged bench code came from slower target
preparation shared with the pipeline (exact XLA TopK in the hybrid-normals
prepass); r3 replaced it with `lax.approx_min_k` (recall 0.99) and moved
scan2map to the fused GICP kernel, which is both the deployed path and
faster than the r1 P2L number.
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results"))
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS.md"))
    args = ap.parse_args()

    rows = []
    for fn in sorted(os.listdir(args.results_dir)):
        if fn.endswith(".json"):
            with open(os.path.join(args.results_dir, fn)) as f:
                r = json.load(f)
            r.setdefault("sequence", fn[:-5])
            rows.append(r)

    lines = [HEADER.rstrip("\n")]
    for r in rows:
        if "ate_rmse_m" in r:
            lines.append(
                f"| {r['sequence']} | {r.get('n_poses', '?')} | "
                f"{r['ate_rmse_m']} | {r['rpe_trans_rmse_m']} | "
                f"{r['rpe_rot_rmse_deg']} | {r['drift_pct']} | {r['rtf']} |")
        else:
            lines.append(f"| {r['sequence']} | — | FAILED "
                         f"({r.get('error', 'no eval metrics')}) | | | | |")
    lines += ["", "Repro (one line per row):", ""]
    for r in rows:
        lines.append("    python -m open3d_slam_tpu.cli.mapping "
                     f"--sim {r['sequence']} --undistort --eval-json "
                     f"results/{r['sequence']}.json")
    lines += [FOOTER_NOTES.rstrip("\n"), "",
              f"Recorded: {time.strftime('%Y-%m-%d %H:%M:%S')} on "
              f"{os.uname().nodename}", ""]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
