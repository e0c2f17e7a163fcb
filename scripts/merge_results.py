"""Assemble RESULTS.md from results/*.json artifacts written by
``scripts/run_results.py`` (which may have been run in several
invocations to fit the single-chip session windows).

The steady-state bench snapshot is read from the NEWEST BENCH_r*.json
artifact in the repo root (never hardcoded), and each row's repro line is
the CLI invocation recorded in that row's eval JSON (``argv`` field), so
regenerating this file cannot silently pair fresh rows with stale numbers
or wrong flags.

Usage:
  python scripts/merge_results.py [--results-dir results] [--out RESULTS.md]
"""
import argparse
import glob
import json
import os
import re
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = """# RESULTS — end-to-end SLAM on the named simulated benchmarks

Full `SlamWrapper` replay (odometry + scan2map GICP + submaps + loop
closure + pose graph) with constant-velocity undistortion, on ONE real
TPU v5e chip via `cli.mapping --sim <name> --eval-json`.  ATE/RPE vs the
simulator's ground truth; RTF = sensor-seconds processed per wall-second
(the reference publishes 3.0x / 7.85x replay RTF on a desktop CPU,
`documentation/source/usage.rst:97-98`).  `LC` = loop-closure constraints
accepted; `submaps` = submap count at finish — the run-health counters a
truncated or closure-free run would show as anomalies.

RTF policy: the chip is reached through a SHARED tunnel whose throughput
and command latency vary 4-100x minute to minute (the same warm-cache
sequence has replayed at both 47 s and 266 s).  Each recorded row is the
best COMPLETE full-length run across retries (scripts/run_results.py
gates on a session-health probe and never downgrades a healthy artifact);
every eval JSON records the `session_probe_ms` / `session_rtt_ms` tunnel
readings taken just before its replay (healthy ~60-65 / ~25-30 ms), so a
congested-session number is distinguishable from a regression.  The
steady-state `pipeline_p50_ms_per_scan` in the bench snapshot below is
the session-robust latency metric.

| sequence | poses | ATE rmse (m) | RPE trans rmse (m) | RPE rot rmse (deg) | drift % | RTF | LC | submaps |
|---|---|---|---|---|---|---|---|---|
"""


def latest_bench():
    """Newest BENCH_r*.json parsed dict, or None."""
    paths = sorted((p for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
                    if re.search(r"r(\d+)", p)),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not paths:
        return None, None
    with open(paths[-1]) as f:
        data = json.load(f)
    return os.path.basename(paths[-1]), data.get("parsed")


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
                f"| {r['sequence']} | {r.get('n_poses', '?')}/{r.get('n_scans', '?')} | "
                f"{r['ate_rmse_m']} | {r['rpe_trans_rmse_m']} | "
                f"{r['rpe_rot_rmse_deg']} | {r['drift_pct']} | {r['rtf']} | "
                f"{r.get('n_loop_closures_accepted', '?')} | "
                f"{r.get('n_submaps', '?')} |")
        else:
            lines.append(f"| {r['sequence']} | — | FAILED "
                         f"({r.get('error', 'no eval metrics')}) | | | | | | |")
    lines += ["", "Repro (the exact recorded invocation per row):", ""]
    for r in rows:
        if "argv" in r:
            cmd = "python -m open3d_slam_tpu.cli.mapping " + " ".join(r["argv"])
        else:
            cmd = (f"# no argv recorded in results/{r['sequence']}.json "
                   "(pre-r4 artifact)")
        lines.append("    " + cmd)

    bench_name, bench = latest_bench()
    if bench is not None:
        lines += [
            "",
            f"## Steady-state bench snapshot (from `{bench_name}`)",
            "",
            "    " + json.dumps(bench),
            "",
            "The sequence-table RTFs can sit below the steady-state rate",
            "implied by `pipeline_p50_ms_per_scan` when a bounded run window",
            "also pays cold jit compiles through the device tunnel; with a",
            "warm persistent compile cache the two converge.",
        ]
    lines += ["",
              f"Recorded: {time.strftime('%Y-%m-%d %H:%M:%S')} on "
              f"{os.uname().nodename}", ""]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
