"""Gather-bandwidth microbenchmark — grounds the super-row gather design.

The round-2 finding: row gathers run at ~60-90 GB/s effective (vs ~800 GB/s
v5e HBM peak) and dominate the device path (attention x/p_r gathers, kNN
re-score). This tool measures achievable gather bandwidth across layouts to
decide which redesign actually pays:

  A. plain row gather from [N, C] for C in {8..512}  (width scaling)
  B. sorted vs random indices                         (locality)
  C. super-row gather: [N/8, 8C] rows + within-row select via block matmul
  D. one-shot vs chained dispatch sanity check

Run ALONE on the TPU (tunnel contention poisons numbers — CLAUDE.md).
Usage: python tools/bench_gather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    N = 24000
    R = 24000 * 36  # flagship gather: 864k rows
    idx_rand = jnp.asarray(rng.integers(0, N, R), jnp.int32)
    idx_sort = jnp.sort(idx_rand)

    def bench_gather(c, idx, tag, iters=10):
        x = jnp.asarray(rng.standard_normal((N, c)), jnp.float32)

        def f(x):
            return jnp.take(x, idx, axis=0)

        dt = chained_time(f, x, iters=iters)
        useful = R * c * 4
        print(f"{tag:<28s} C={c:<4d} {dt * 1e3:7.2f} ms  "
              f"{useful / dt / 1e9:7.1f} GB/s useful", flush=True)
        return dt

    print("\n-- A/B: plain gather [N,C], random vs sorted idx --")
    for c in (8, 32, 128, 256, 512):
        bench_gather(c, idx_rand, "plain/random")
    bench_gather(32, idx_sort, "plain/sorted")
    bench_gather(128, idx_sort, "plain/sorted")

    print("\n-- A2: bf16 gathers (serving dtype) --")
    for c in (32, 64, 128, 256):
        x = jnp.asarray(rng.standard_normal((N, c)), jnp.float32
                        ).astype(jnp.bfloat16)

        def fb(x):
            return jnp.take(x, idx_rand, axis=0)

        dt = chained_time(fb, x, iters=10)
        useful = R * c * 2
        print(f"{'bf16/random':<28s} C={c:<4d} {dt * 1e3:7.2f} ms  "
              f"{useful / dt / 1e9:7.1f} GB/s useful", flush=True)

    print("\n-- A3: crop-stage shape (1.77M rows of [49152, 32] bf16) --")
    Rc = 16 * 3072 * 36
    idx_c = jnp.asarray(rng.integers(0, 49152, Rc), jnp.int32)
    xc = jnp.asarray(rng.standard_normal((49152, 32)), jnp.float32
                     ).astype(jnp.bfloat16)

    def fc(x):
        return jnp.take(x, idx_c, axis=0)

    dt = chained_time(fc, xc, iters=8)
    print(f"{'crop bf16/random':<28s} C=32   {dt * 1e3:7.2f} ms  "
          f"{Rc * 32 * 2 / dt / 1e9:7.1f} GB/s useful", flush=True)

    print("\n-- A4: one-hot MXU 'gather', CROP shape (per-crop N=3072) --")
    # viable only when the per-crop source is small: FLOPs = R * N_src * C
    # (16 crops x 3072 queries x 36 nbrs, N_src 3072, C 32 -> 348 GFLOP bf16)
    for c, dtt in ((32, jnp.bfloat16),):
        xb = jnp.asarray(rng.standard_normal((16, 3072, c)),
                         jnp.float32).astype(dtt)
        idxb = jnp.asarray(rng.integers(0, 3072, (16, 3072 * 36)), jnp.int32)

        def fo(xb):
            def crop(args):
                xc, ic = args                       # [3072, C], [3072*36]
                def chunk(icc):                     # [6144] rows at a time
                    oh = (icc[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (1, 3072), 1)).astype(dtt)
                    return jnp.dot(oh, xc, preferred_element_type=jnp.float32)
                return jax.lax.map(chunk, ic.reshape(-1, 6144))

            return jax.lax.map(crop, (xb, idxb))

        dt = chained_time(fo, xb, iters=8)
        print(f"{'one-hot matmul (crop)':<28s} C={c:<4d} {dt * 1e3:7.2f} ms "
              f" vs plain crop gather above", flush=True)

    print("\n-- C: super-row gather [N/8, 8C] + matmul select --")
    # gather super-rows then select 1-of-8 via mask + block-eye matmul
    for c in (32, 128):
        xs = jnp.asarray(rng.standard_normal((N // 8, 8 * c)), jnp.float32)
        sel_eye = jnp.tile(jnp.eye(c, dtype=jnp.float32), (8, 1))  # [8C, C]

        def f(xs):
            sr = jnp.take(xs, idx_rand // 8, axis=0)        # [R, 8C]
            sub = (idx_rand % 8).astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8 * c), 1) // c
            m = (lane == sub[:, None]).astype(jnp.float32)  # [R, 8C]
            return jnp.matmul(sr * m, sel_eye,
                              preferred_element_type=jnp.float32)

        dt = chained_time(f, xs, iters=10)
        useful = R * c * 4
        print(f"{'super-row+select':<28s} C={c:<4d} {dt * 1e3:7.2f} ms  "
              f"{useful / dt / 1e9:7.1f} GB/s useful(out)", flush=True)

    print("\n-- C2: super-row gather only (no select) --")
    for c in (32,):
        xs = jnp.asarray(rng.standard_normal((N // 8, 8 * c)), jnp.float32)

        def f(xs):
            return jnp.take(xs, idx_rand // 8, axis=0)

        dt = chained_time(f, xs, iters=10)
        moved = R * 8 * c * 4
        print(f"{'super-row raw':<28s} C={c:<4d} {dt * 1e3:7.2f} ms  "
              f"{moved / dt / 1e9:7.1f} GB/s moved", flush=True)

    print("\n-- D: dedup'd cell gather: 9 cand super-rows per 8-pt cell --")
    # the cell-list design: each 8-point cell gathers 9 candidate super-rows
    n_cells = N // 8
    cand = jnp.asarray(rng.integers(0, n_cells, (n_cells, 9)), jnp.int32)
    for c in (32, 128):
        xs = jnp.asarray(rng.standard_normal((n_cells, 8 * c)), jnp.float32)

        def f(xs):
            return jnp.take(xs, cand.reshape(-1), axis=0)   # [n_cells*9, 8C]

        dt = chained_time(f, xs, iters=10)
        moved = n_cells * 9 * 8 * c * 4
        print(f"{'cell-cand gather':<28s} C={c:<4d} {dt * 1e3:7.2f} ms  "
              f"{moved / dt / 1e9:7.1f} GB/s moved", flush=True)


if __name__ == "__main__":
    main()
