"""Run the named simulated benchmark sequences end-to-end on the TPU and
write RESULTS.md (+ results/*.json artifacts).

All sequences run IN ONE PROCESS (one backend session) by calling the
public CLI's main() directly — on a tunneled single-chip backend, session
churn is the dominant failure mode (a killed or churned session can wedge
the remote chip for ~20 min).  The recorded repro line per row is still
the standalone CLI command.  --max-wall-sec bounds each sequence so the
whole run finishes cleanly.

Usage:
  env PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_results.py \
      [--sequences a,b,c] [--budget-per-seq 300] [--out RESULTS.md]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(name: str, budget: float, results_dir: str) -> dict:
    from open3d_slam_tpu.cli import mapping
    out_json = os.path.join(results_dir, f"{name}.json")
    argv = ["--sim", name, "--undistort", "--eval-json", out_json,
            "--max-wall-sec", str(budget)]
    print(f"\n=== {name}: python -m open3d_slam_tpu.cli.mapping "
          + " ".join(argv), flush=True)
    t0 = time.time()
    try:
        rc = mapping.main(argv)
    except Exception as e:
        print(f"EXCEPTION: {e!r}", flush=True)
        rc = 99
    wall = time.time() - t0
    row = {"sequence": name, "returncode": rc, "wall_s": round(wall, 1),
           "cmd": f"open3d_slam_tpu.cli.mapping {' '.join(argv)}"}
    if os.path.exists(out_json):
        row.update(json.load(open(out_json)))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequences", default=None,
                    help="comma-separated subset (default: all named)")
    ap.add_argument("--budget-per-seq", type=float, default=300.0)
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS.md"))
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from open3d_slam_tpu.io import lidar_sim
    names = (args.sequences.split(",") if args.sequences
             else sorted(lidar_sim.BENCHMARK_SEQUENCES))
    os.makedirs(args.results_dir, exist_ok=True)

    rows = [run_one(n, args.budget_per_seq, args.results_dir) for n in names]
    for r in rows:
        print(json.dumps(r), flush=True)

    # RESULTS.md has ONE writer: merge_results.py assembles it from the
    # results/*.json artifacts (incl. the recorded argv repro lines and the
    # newest BENCH_r*.json snapshot).
    import subprocess
    subprocess.run([sys.executable, os.path.join(REPO, "scripts",
                                                 "merge_results.py"),
                    "--results-dir", args.results_dir, "--out", args.out],
                   check=True)
    print(f"\nwrote {args.out}")
    bad = [r for r in rows if r["returncode"] != 0]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
