"""Microbenchmark of axon-tunnel execution/transfer semantics.

Answers three questions that decide the pipeline design:
  1. Does a D2H transfer of program A's output wait for later-dispatched
     program B (strictly ordered stream) or fire as soon as A is done?
  2. Does ``copy_to_host_async`` issued at dispatch time make a later
     blocking device_get ~free?
  3. What is the fixed per-program overhead (20 tiny programs vs 1)?
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    t0 = time.monotonic()
    np.asarray(jnp.arange(8))
    print(f"session acquired in {time.monotonic() - t0:.1f} s", flush=True)

    # Heavy program ~50-100 ms: big matmul chain.
    M = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def heavy(x, n_iter=60):
        def body(_, a):
            return a @ M * (1.0 / 2048.0)
        return jax.lax.fori_loop(0, n_iter, body, x)[0, 0]

    @jax.jit
    def tiny(x):
        return x + 1.0

    # Warm compiles.
    np.asarray(heavy(M))
    np.asarray(tiny(jnp.float32(0.0)))

    # Calibrate heavy duration + RTT.
    t = time.perf_counter()
    a = heavy(M)
    np.asarray(a)
    t_heavy = time.perf_counter() - t
    t = time.perf_counter()
    np.asarray(tiny(jnp.float32(0.0)))
    t_rtt = time.perf_counter() - t
    print(f"heavy: {t_heavy*1e3:.1f} ms   tiny+rtt: {t_rtt*1e3:.1f} ms",
          flush=True)

    # Q1: transfer ordering.
    for trial in range(3):
        a = heavy(M)
        b = heavy(M * 0.5)
        t = time.perf_counter()
        np.asarray(a)          # A's scalar; B queued behind it
        dt = (time.perf_counter() - t) * 1e3
        np.asarray(b)
        print(f"Q1 trial {trial}: get(A) with B queued = {dt:.1f} ms "
              f"(bypass ~= {t_heavy*1e3:.0f}, ordered ~= {2*t_heavy*1e3:.0f})",
              flush=True)

    # Q2: copy_to_host_async at dispatch time.
    for trial in range(3):
        a = heavy(M)
        try:
            a.copy_to_host_async()
            ok = True
        except Exception as e:
            print(f"Q2: copy_to_host_async unsupported: {e}", flush=True)
            ok = False
            break
        b = heavy(M * 0.5)
        time.sleep(2.5 * t_heavy)   # let A finish + response ride back
        t = time.perf_counter()
        np.asarray(a)
        dt = (time.perf_counter() - t) * 1e3
        np.asarray(b)
        print(f"Q2 trial {trial}: get(A) after async copy + sleep = "
              f"{dt:.1f} ms (prefetched ~= 0)", flush=True)

    # Q3: per-program overhead.
    x = jnp.float32(0.0)
    t = time.perf_counter()
    y = x
    for _ in range(20):
        y = tiny(y)
    np.asarray(y)
    t20 = (time.perf_counter() - t) * 1e3
    print(f"Q3: 20 chained tiny programs: {t20:.1f} ms "
          f"(1 program: {t_rtt*1e3:.1f}) -> per-program ~"
          f"{(t20 - t_rtt*1e3)/19:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
