"""A/B benchmark: super-row cell-candidate attention vs regular gathers.

Times the full-res backbone forwards (fps-model stage-1 at 24k; bdl-model
stage-1 at 24k with its stride-(1,1) second stage) with cell_attention on/off
on a spatially sorted synthetic cloud — the decisive measurement for the
round-3 gather redesign. Run ALONE on the TPU.

Usage: python tools/bench_cells.py [--dtype bfloat16] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=24000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.models.tgnet import TGNet
    from toothgroupnetwork_tpu.ops.cells import (
        build_cell_candidates, spatial_sort_perm)
    from toothgroupnetwork_tpu.ops import knn_points
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()} dtype={args.dtype}", flush=True)
    n = args.n
    rng = np.random.default_rng(0)
    u1 = rng.uniform(-1, 1, n)
    u2 = rng.uniform(-1, 1, n)
    xyz = np.stack([1.2 * u1, 0.5 * u1 ** 2 - 0.3, 0.4 * u2], 1)
    xyz = (xyz + rng.normal(0, 0.01, xyz.shape)).astype(np.float32)
    xyz = xyz[spatial_sort_perm(xyz)]
    feat = np.concatenate(
        [xyz, rng.standard_normal((n, 3)).astype(np.float32) * 0.1], 1)
    featj = jnp.asarray(feat[None])

    # candidate-slot coverage diagnostics at k=36
    idx, _ = knn_points(jnp.asarray(xyz), jnp.asarray(xyz), 36,
                        include_self=True, need_dist=False)
    for L in (24, 32, 40):
        _, pos, ncells = build_cell_candidates(idx, L)
        pos, ncells = np.asarray(pos), np.asarray(ncells)
        print(f"L={L}: cells mean={ncells.mean():.1f} "
              f"p99={np.percentile(ncells, 99):.0f} max={ncells.max()} "
              f"overflow_slots={(pos == L * 8).mean() * 100:.2f}%", flush=True)

    dtype = jnp.dtype(args.dtype)
    labels = jnp.zeros((1, n), jnp.int32)

    def run_ab(name, **arch):
        times = {}
        for cells in (False, True):
            mod = TGNet(crop_size=3072, c=6, dtype=dtype,
                        cell_attention=cells, **arch)
            t0 = time.time()
            vs = jax.jit(mod.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), featj, None, train=False,
                labels=labels)
            print(f"  [{name} cells={cells}] init+compile "
                  f"{time.time() - t0:.0f}s", flush=True)

            def s1(f, mod=mod, vs=vs):
                out = mod.apply(vs, f, None, method=TGNet.stage1)
                return out["sem_1"], out["offset_1"]

            dt = chained_time(s1, featj, iters=args.iters)
            times[cells] = dt
            print(f"  [{name} cells={cells}] stage1 {dt * 1e3:.1f} ms",
                  flush=True)
        print(f"{name}: OFF {times[False]*1e3:.1f} ms -> ON "
              f"{times[True]*1e3:.1f} ms "
              f"({times[False]/times[True]:.2f}x)", flush=True)

    run_ab("bdl(16/32 stride1,1)", planes=(16, 32), stride=(1, 1),
           nsample=(36, 24), blocks=(2, 3), block_num=2)
    run_ab("fps(full arch)", planes=(32, 64, 128, 256, 512),
           stride=(1, 4, 4, 4, 4), nsample=(36, 24, 24, 24, 24),
           blocks=(2, 3, 4, 6, 3), block_num=5)


if __name__ == "__main__":
    main()
