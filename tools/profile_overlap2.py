"""Does anything hide under anything on the tunneled TPU? (r4)

BENCH_r03/r04 show run_many wall ~= per-phase sum — nothing overlaps. This
isolates WHICH resource serializes, with three two-thread experiments:

  A. device-busy + UPLOAD:   thread 1 keeps the device executing compiled
     matmul chains; thread 2 times 1.25 MB device_puts (the per-scan mesh
     upload). If uploads pipeline with executes, their wall under load ~=
     alone; if the link/client serializes, it's execute+upload summed.
  B. device-busy + READBACK: same with a ~200 KB fetch (the per-scan
     stage-1 fetch class).
  C. device-busy + NUMPY:    thread 2 runs a DBSCAN-ish numpy workload (the
     host phases) — measures how much CPU the GIL + 1-core host grant while
     thread 1 blocks on device_get.

Usage: python tools/profile_overlap2.py  (run ALONE)
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"backend={jax.default_backend()} cpus={os.cpu_count()}",
          flush=True)
    rng = np.random.default_rng(0)

    # device-busy loop: one compiled program ~55 ms of pure compute
    x0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    @jax.jit
    def burn(x):
        def body(_, a):
            return jnp.tanh(a @ a) * 0.5

        return jax.lax.fori_loop(0, 24, body, x)

    r = burn(x0)
    _ = np.asarray(r)  # warm + sync
    t0 = time.perf_counter()
    n_burn = 6
    for _ in range(n_burn):
        r = burn(r)
    _ = np.asarray(r[0, 0])
    burn_ms = (time.perf_counter() - t0) / n_burn * 1e3
    print(f"burn: {burn_ms:.1f} ms/execute (x{n_burn})", flush=True)

    up_host = rng.standard_normal((100_000, 6)).astype(np.float16)
    big = jnp.asarray(rng.standard_normal((1 << 16, 400)).astype(np.float32))

    @jax.jit
    def mk_fetch(i):
        return (big[: 256 * 200, :1] * 1.0).reshape(-1)[: 100_000] + i

    _ = np.asarray(mk_fetch(jnp.float32(0.0)))

    def timed(fn, iters):
        t0 = time.perf_counter()
        for i in range(iters):
            fn(i)
        return (time.perf_counter() - t0) / iters * 1e3

    def up_once(i):
        a = jax.device_put(up_host)
        a.block_until_ready()

    def fetch_once(i):
        _ = np.asarray(mk_fetch(jnp.float32(i)))

    def numpy_once(i):
        from scipy.spatial import cKDTree

        pts = rng.standard_normal((20000, 3)).astype(np.float32)
        t = cKDTree(pts)
        t.query(pts[:4000], k=8, workers=1)

    base = {}
    for name, fn, iters in (("upload 1.2MB", up_once, 8),
                            ("fetch 0.4MB", fetch_once, 8),
                            ("numpy kdtree", numpy_once, 4)):
        base[name] = timed(fn, iters)
        print(f"alone  {name:<14s} {base[name]:8.1f} ms", flush=True)

    stop = threading.Event()
    burns_done = [0]

    def burner():
        rr = burn(x0)
        while not stop.is_set():
            rr = burn(rr)
            _ = np.asarray(rr[0, 0])  # sync each iteration (scan-like)
            burns_done[0] += 1

    for name, fn, iters in (("upload 1.2MB", up_once, 8),
                            ("fetch 0.4MB", fetch_once, 8),
                            ("numpy kdtree", numpy_once, 4)):
        stop.clear()
        burns_done[0] = 0
        th = threading.Thread(target=burner, daemon=True)
        th.start()
        time.sleep(0.3)
        dt = timed(fn, iters)
        span0 = time.perf_counter()
        time.sleep(0.001)
        stop.set()
        th.join()
        print(f"under-load {name:<14s} {dt:8.1f} ms "
              f"(alone {base[name]:.1f}; burner kept "
              f"{burns_done[0]} executes going)", flush=True)


if __name__ == "__main__":
    main()
