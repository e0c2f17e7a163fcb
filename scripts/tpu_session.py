"""One long-lived TPU session for post-change validation: probe until the
chip is reachable, then per-stage pipeline profile, then full bench.py.

Keeping everything in ONE backend session avoids the tunnel's
session-churn wedge (see .claude/skills/verify/SKILL.md).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_session.py
"""
import subprocess
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print("probing chip...", flush=True)
    t0 = time.time()
    np.asarray(jnp.arange(8))          # blocks until the chip is free
    print(f"chip reachable after {time.time() - t0:.0f} s", flush=True)

    sys.argv = ["profile_pipeline", "16", "400"]
    import runpy
    t0 = time.time()
    runpy.run_path("scripts/profile_pipeline.py", run_name="__main__")
    print(f"profile done in {time.time() - t0:.0f} s", flush=True)

    sys.argv = ["bench"]   # don't leak the profiler's argv into bench.py
    t0 = time.time()
    runpy.run_path("bench.py", run_name="__main__")
    print(f"bench done in {time.time() - t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
