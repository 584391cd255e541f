"""Does a tunnel FETCH overlap another thread's device EXECUTEs?

BENCH_r03 showed run_many x6 workers=3 at 552 ms/scan == the serial phase sum,
i.e. thread overlap bought nothing. tools/profile_tunnel.py proved two
threads' small RPCs pipeline — but the serving pipe's serial resource is
device compute + BYTE transfers, so the question that decides the run_many
architecture is whether a ~1 MB device_get proceeds WHILE the device runs
another thread's program (different RPC streams on the tunnel server), or
whether execute and fetch serialize server-side.

Method: thread A loops a fixed number of ~30 ms device programs (matmul
chain); thread B concurrently loops ~1 MB fetches of resident arrays. Compare
A's wall time alone vs with B, and B's per-fetch time alone vs with A:
  * both unchanged        -> full overlap: run_many threads can hide fetch
                             bytes under other scans' device time
  * A+B ~= A_alone+B_alone -> serialized: bytes are part of the serial pipe,
                             shrink them / batch scans per dispatch instead

Usage: python tools/profile_overlap.py [--execs 40] [--fetches 40]
"""

from __future__ import annotations

import argparse
import threading
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs", type=int, default=40)
    ap.add_argument("--fetches", type=int, default=40)
    ap.add_argument("--mb", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"backend={jax.default_backend()}", flush=True)

    n = 3072  # ~30 ms of chained matmuls at 3072^2
    a = jnp.asarray(np.random.default_rng(0).random((n, n), np.float32))

    @jax.jit
    def work(x):
        def body(_, c):
            return jnp.tanh(c @ c * 1e-3 + c)
        return jax.lax.fori_loop(0, 24, body, x)

    # resident fetch targets (distinct arrays — refetching one array is free,
    # CLAUDE.md tunnel profile note)
    rows = int(args.mb * 1024 * 1024 // 4 // 128)
    pool = [jax.device_put(np.random.default_rng(i).random(
        (rows, 128), np.float32)) for i in range(8)]
    for p in pool:
        jax.block_until_ready(p)
    fetched = work(a)
    np.asarray(fetched[0, 0])  # warm compile

    def run_execs(k):
        t0 = time.perf_counter()
        x = a
        for _ in range(k):
            x = work(x)
        np.asarray(x[0, 0])
        return time.perf_counter() - t0

    @jax.jit
    def bump(p):
        return p + 1.0

    fresh = [bump(p) for p in pool]

    def run_fetches(k):
        t0 = time.perf_counter()
        for i in range(k):
            # fetch a FRESH computed array each time (device_put'd arrays
            # keep a host copy — fetching those measures ~0)
            np.asarray(fresh[i % len(fresh)])
        return time.perf_counter() - t0

    # warm + baselines (alone)
    run_execs(4)
    run_fetches(8)
    t_exec = run_execs(args.execs)
    print(f"execs alone: {args.execs} x {t_exec / args.execs * 1e3:.1f} ms "
          f"= {t_exec:.2f} s", flush=True)
    t_fetch = run_fetches(args.fetches)
    print(f"fetches alone: {args.fetches} x "
          f"{t_fetch / args.fetches * 1e3:.1f} ms = {t_fetch:.2f} s",
          flush=True)

    res = {}

    def a_thread():
        res["exec"] = run_execs(args.execs)

    def b_thread():
        res["fetch"] = run_fetches(args.fetches)

    ta = threading.Thread(target=a_thread)
    tb = threading.Thread(target=b_thread)
    t0 = time.perf_counter()
    ta.start(); tb.start(); ta.join(); tb.join()
    wall = time.perf_counter() - t0
    print(f"concurrent: wall {wall:.2f} s vs serial-sum "
          f"{t_exec + t_fetch:.2f} s; exec thread {res['exec']:.2f} s, "
          f"fetch thread {res['fetch']:.2f} s", flush=True)
    overlap = (t_exec + t_fetch - wall) / min(t_exec, t_fetch)
    print(f"overlap efficiency: {overlap * 100:.0f}% "
          f"(100% = the smaller stream fully hidden)", flush=True)


if __name__ == "__main__":
    main()
