"""Re-measure the serving pipe's device programs with the DCE-PROOF
chained-timing dep (utils/profiling.py:_dep_scalar now sums every output
element — the old single-element dep let XLA dead-code-eliminate whole
backbones: stage1 'cost' 6.2 ms chained while its wall cost was ~80-90 ms).

Also times N sequential un-forced dispatches + one final fetch of stage1 —
an alternative honest estimate that includes real per-dispatch overhead.

Usage: python tools/profile_recheck.py [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n-side", type=int, default=317)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import setup_pipeline
    from toothgroupnetwork_tpu.data.scan_prep import prep_scan_host_tgn
    from toothgroupnetwork_tpu.models.tgnet import TGNet
    from toothgroupnetwork_tpu.pipelines import base as pb
    from toothgroupnetwork_tpu.pipelines import tgn as tgn_mod
    from toothgroupnetwork_tpu.postprocess.boundary import (
        _purity_device_fn, _purity_window_fn)
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
    labels = jnp.asarray(rng.integers(0, 17, n).astype(np.uint8))
    samp_xyz = feats[0]
    cents = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * .3)
    valid = jnp.ones((1, 16), bool)

    def bench(name, fn, *a, **kw):
        dt = chained_time(fn, *a, iters=args.iters, **kw)
        print(f"{name:<46s} {dt * 1e3:9.2f} ms", flush=True)

    real = getattr(pipe, "_real_stage1", None) or pipe._fps_stage1
    bench("fps stage1 (DCE-proof dep)",
          lambda f: pipe.fps_module.apply(pipe.fps_vars, f, None,
                                          method=TGNet.stage1), feats)

    # N sequential dispatches, ONE final force: true per-dispatch cost
    s1 = jax.jit(lambda f: pipe.fps_module.apply(pipe.fps_vars, f, None,
                                                 method=TGNet.stage1))
    r = s1(feats)
    np.asarray(r["sem_1"][0, 0, 0])   # warm
    t0 = time.perf_counter()
    outs = [s1(feats) for _ in range(8)]
    vals = [np.asarray(o["sem_1"][0, 0, 0]) for o in outs]
    dt = (time.perf_counter() - t0) / 8
    print(f"{'fps stage1 8-dispatch wall/dispatch':<46s} {dt * 1e3:9.2f} ms",
          flush=True)

    bench("fps stage2 fwd-only (DCE-proof)",
          lambda f: pipe._fps_stage2(f, cents, valid), feats)
    bench("bdl stage1 fwd (DCE-proof)",
          lambda f: pipe.bdl_module.apply(pipe.bdl_vars, f, None,
                                          method=TGNet.stage1), feats)
    bench("purity FLAT (DCE-proof)",
          lambda p: _purity_device_fn(p, samp_xyz, labels, 40, 0.7,
                                      n_valid=n0), pad_dev)
    bench("purity WINDOW (DCE-proof)",
          lambda p: _purity_window_fn(p, samp_xyz, labels, 40, 0.7,
                                      n_valid=n0), pad_dev)
    sel = jnp.asarray(rng.permutation(n0)[:n].astype(np.int32))
    num_bdl = pipe.boundary_info["num_of_bdl_points"]
    bench("bdl_nn1_sel approx (DCE-proof)",
          lambda p: tgn_mod._bdl_nn1_sel_fn(p, sel, 18000, num_bdl), pad_dev)
    bench("bdl_nn1 WINDOW (DCE-proof)",
          lambda p: tgn_mod._bdl_nn1_win_fn(p, sel, 18000, n0, num_bdl),
          pad_dev)
    # window-vs-approx parity at the production shape
    ia, da = jax.device_get(tgn_mod._bdl_nn1_sel_fn(pad_dev, sel, 18000,
                                                    num_bdl))
    iw, dw2 = jax.device_get(tgn_mod._bdl_nn1_win_fn(pad_dev, sel, 18000,
                                                     n0, num_bdl))
    dis = ia[:n0] != iw[:n0]
    import numpy as _np2
    rel = (_np2.abs(da[:n0] - dw2[:n0])
           / _np2.maximum(_np2.minimum(da[:n0], dw2[:n0]), 1e-12))
    print(f"bdl_nn1 window-vs-approx: idx disagree {dis.mean():.4f}; "
          f"rel-d2 gap max {rel.max():.2e} "
          f"p999 {_np2.quantile(rel, 0.999):.2e}", flush=True)
    _, _, fused_fn = pb._fps_gather_jits()
    ax = int(np.argmax(bdl_feats[:, :3].var(axis=0)))
    quota_pad = min(-(-(-(-n // 16)) // 128) * 128, -(-n0 // 16))
    bench("fps_fused partition (DCE-proof)",
          lambda p: fused_fn(p, np.int32(n0), np.int32(ax),
                             quota_pad=quota_pad, n=n, n_chunks=16), pad_dev)

    # window-vs-flat d2 disagreement magnitude (bf16-tie class?)
    bf, lf, nf, df, _ = jax.device_get(_purity_device_fn(
        pad_dev, samp_xyz, labels, 40, 0.7, n_valid=n0))
    bw, lw, nw, dw, _ = jax.device_get(_purity_window_fn(
        pad_dev, samp_xyz, labels, 40, 0.7, n_valid=n0))
    d = nf[:n0] != nw[:n0]
    if d.any():
        rel = np.abs(df[:n0][d] - dw[:n0][d]) / np.maximum(
            np.minimum(df[:n0][d], dw[:n0][d]), 1e-12)
        print(f"nn1 disagreements: {d.mean():.4f} frac; rel-d2 gap "
              f"median {np.median(rel):.2e} max {rel.max():.2e}", flush=True)
    else:
        print("nn1 disagreements: none", flush=True)


if __name__ == "__main__":
    main()
