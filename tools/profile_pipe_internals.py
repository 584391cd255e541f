"""Chained-timing of the SUB-COMPONENTS of the serving pipe's three largest
device programs (per tools/profile_pipe_device.py: purity 125.6 ms, bdl fused
118.8 ms, fps stage2 88.9 ms at r4 start) — decides which inner op to attack.

Components measured at production shapes:
  * make_crops alone (top-3072 selection from 24k + row gather + recenter)
  * stage2 backbone forward alone over the [16, 3072, 6] crops
  * _device_votes alone
  * bdl stage1 forward alone at [1, 24000, 6] (stride-1 arch)
  * the in-program 24k-row gather from the padded org upload
  * purity kNN alone (104k x 24k k=40, bf16 selection, need_dist=False)
  * purity ratio label-gather alone ([104k, 40] u8 gather + mean)
  * speculative FPS alone (exact 4096-iteration masked FPS over 104k)

Usage: python tools/profile_pipe_internals.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n-side", type=int, default=317)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import setup_pipeline
    from toothgroupnetwork_tpu.data.scan_prep import prep_scan_host_tgn
    from toothgroupnetwork_tpu.models.tgnet import TGNet, make_crops
    from toothgroupnetwork_tpu.ops import farthest_point_sample, knn_points
    from toothgroupnetwork_tpu.pipelines import base as pb
    from toothgroupnetwork_tpu.pipelines import tgn as tgn_mod
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    pipe, obj_path = setup_pipeline("bfloat16", args.n_side)
    out = pipe(obj_path)
    print(f"pipeline warm; n_vertices={len(out['sem'])}", flush=True)

    org_feats, bdl_feats = prep_scan_host_tgn(obj_path, pipe.n_sample)
    n0 = bdl_feats.shape[0]
    n = pipe.n_sample
    n_pad = -(-n0 // 8192) * 8192
    pad = np.zeros((n_pad, 6), np.float16)
    pad[:n0] = bdl_feats
    pad_dev = jnp.asarray(pad)
    feats_dev = pb.fps_sample_dev(bdl_feats, n)
    feats = jax.block_until_ready(feats_dev)[None]
    rng = np.random.default_rng(0)
    cents = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * .3)
    valid = jnp.ones((1, 16), bool)
    crop_size = pipe.crop_size

    rows = []

    def bench(name, fn, *a, **kw):
        dt = chained_time(fn, *a, iters=args.iters, **kw)
        rows.append((name, dt * 1e3))
        print(f"{name:<46s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    # ---- fps stage2 internals ----
    @jax.jit
    def crops_only(f):
        crop, crop_mask, idx, _ = make_crops(f, cents, valid, crop_size,
                                             sel_bf16=True)
        return crop, crop_mask, idx

    bench("make_crops (sel 3072-of-24k + gather)", crops_only, feats)
    crop, crop_mask, crop_idx = jax.block_until_ready(crops_only(feats))

    fwd2 = jax.jit(lambda cf: pipe.fps_module.apply(
        pipe.fps_vars, cf, crop_mask, method=TGNet.stage2))
    bench("fps stage2 fwd [16,3072]", lambda cf: fwd2(cf)["sem_1"], crop)

    sem2 = jax.block_until_ready(fwd2(crop))["sem_1"]
    votes = jax.jit(lambda s: tgn_mod._device_votes(s, crop_idx[0], valid[0],
                                                    n))
    bench("_device_votes", votes, sem2.astype(jnp.float32))

    # ---- bdl fused internals ----
    sel = jnp.asarray(rng.permutation(n0)[:n].astype(np.int32))

    @jax.jit
    def gather_only(p):
        return jnp.take(p, sel, axis=0)[None].astype(jnp.float32)

    bench("bdl row gather 24k-of-106k", gather_only, pad_dev)

    bdl1 = jax.jit(lambda f: pipe.bdl_module.apply(
        pipe.bdl_vars, f, None, method=TGNet.stage1))
    bench("bdl stage1 fwd [1,24000] stride-1",
          lambda f: bdl1(f)["sem_1"], feats)

    @jax.jit
    def bdl_crops(f):
        crop, cm, idx, _ = make_crops(f, cents, valid, crop_size,
                                      sel_bf16=True)
        return crop, cm, idx

    cropb, cmb, _ = jax.block_until_ready(bdl_crops(feats))
    fwd2b = jax.jit(lambda cf: pipe.bdl_module.apply(
        pipe.bdl_vars, cf, cmb, method=TGNet.stage2))
    bench("bdl stage2 fwd [16,3072]", lambda cf: fwd2b(cf)["sem_1"], cropb)

    # ---- purity internals ----
    labels = jnp.asarray(rng.integers(0, 17, n).astype(np.uint8))
    samp_xyz = feats[0]

    @jax.jit
    def pur_knn(p):
        q = p[:, :3].astype(jnp.float32)
        s = samp_xyz[:, :3].astype(jnp.float32)
        idx, _ = knn_points(q, s, 40, None, None, need_dist=False,
                            sel_bf16=True)
        return idx

    bench("purity kNN 106k x 24k k=40 (bf16 sel)", pur_knn, pad_dev)
    idx40 = jax.block_until_ready(pur_knn(pad_dev))

    @jax.jit
    def ratio_only(p):
        nn1_lab = jnp.take(labels, idx40[:, 0])
        lab = jnp.take(labels, idx40.reshape(-1)).reshape(idx40.shape)
        r = jnp.mean((lab == nn1_lab[:, None]).astype(jnp.float32), axis=1)
        return r + 0 * p[0, 0].astype(jnp.float32)

    bench("purity ratio label-gather [106k,40]", ratio_only, pad_dev)

    @jax.jit
    def spec_fps(p):
        q = p[:, :3].astype(jnp.float32)
        ok = jnp.arange(q.shape[0]) < n0
        return farthest_point_sample(q, 4096, ok)

    bench("spec FPS 4096 iters over 106k", spec_fps, pad_dev)

    # full purity programs: flat (r3 default) vs windowed (r4)
    from toothgroupnetwork_tpu.postprocess.boundary import (
        _purity_device_fn, _purity_window_fn)

    bench("purity FLAT program (knn+nn1+ratio+specfps)",
          lambda p: _purity_device_fn(p, samp_xyz, labels, 40, 0.7,
                                      n_valid=n0)[0], pad_dev)
    bench("purity WINDOW program (r4)",
          lambda p: _purity_window_fn(p, samp_xyz, labels, 40, 0.7,
                                      n_valid=n0)[0], pad_dev)

    # device-side parity spot check flat vs window
    bf, lf, nf, df, ff = jax.device_get(_purity_device_fn(
        pad_dev, samp_xyz, labels, 40, 0.7, n_valid=n0))
    bw, lw, nw, dw, fw = jax.device_get(_purity_window_fn(
        pad_dev, samp_xyz, labels, 40, 0.7, n_valid=n0))
    import numpy as _np
    print(f"window-vs-flat parity: bd agree {(bf[:n0] == bw[:n0]).mean():.4f} "
          f"nn1 agree {(nf[:n0] == nw[:n0]).mean():.4f} "
          f"nn1_lab agree {(lf[:n0] == lw[:n0]).mean():.4f} "
          f"d2 close {_np.allclose(df[:n0], dw[:n0], rtol=1e-3, atol=1e-8)}",
          flush=True)

    # new bdl_nn1 (approx selection)
    num_bdl = pipe.boundary_info["num_of_bdl_points"]
    bench(f"bdl_nn1_sel ({n_pad}x{num_bdl}) [new approx]",
          lambda p: tgn_mod._bdl_nn1_sel_fn(p, sel, 18000, num_bdl), pad_dev)

    total = sum(ms for _, ms in rows)
    print(f"\nsum of parts: {total:.1f} ms", flush=True)

    # ---- wall-clock (NOT chained) tunnel-side costs of the stage-1 phase ----
    # decomposes BENCH_r03's 213 ms fps:stage1_device wall vs ~19 ms chained
    # compute: upload, dispatch, fetch (each sample = median of 5)
    import time

    def wall(label, f, reps=5):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            vals.append(time.perf_counter() - t0)
        print(f"{label:<46s} med {sorted(vals)[reps // 2] * 1e3:9.1f} ms",
              flush=True)

    print("\nwall-clock tunnel costs:", flush=True)
    pad_np = np.zeros((n_pad, 6), np.float16)
    pad_np[:n0] = bdl_feats
    wall("host pad copy", lambda: pad_np.copy())
    wall("upload 1.25MB f16 + 1-elem force",
         lambda: np.asarray(jnp.asarray(pad_np)[0, 0]))

    def full_seq():
        ctx2: dict = {}
        fd2, i2, _f = pb.fps_sample_dev(bdl_feats, n, return_idx=True,
                                        ctx=ctx2)
        c2, m2 = pipe._fps_stage1(fd2[None])
        return jax.device_get((i2, c2[0], m2[0]))

    wall("FULL stage1 seq (upload+fps+fwd+fetch)", full_seq)

    def fetch_only():
        c2, m2 = pipe._fps_stage1(feats)
        return jax.device_get((c2[0], m2[0]))

    wall("stage1 dispatch+fetch (input resident)", fetch_only)


if __name__ == "__main__":
    main()
