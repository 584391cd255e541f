"""Chained-timing of each DEVICE program the tgn serving pipeline dispatches,
at production shapes (100k-vertex scan, 24k sample).

The e2e phase breakdown (bench_e2e.py) measures WALL time per phase — which
through the tunnel includes RTT, queueing behind other scans' dispatches, and
fetch bytes. This tool isolates the pure device-compute budget per scan: if the
sum of these chained numbers ~= the overlapped run_many ms/scan, the pipe is
DEVICE-bound and the levers are kernel-level; if it is much smaller, the levers
are sync points / overlap.

Usage: python tools/profile_pipe_device.py [--dtype bfloat16] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n-side", type=int, default=317)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import setup_pipeline
    from toothgroupnetwork_tpu.data.scan_prep import prep_scan_host_tgn
    from toothgroupnetwork_tpu.pipelines import base as pb
    from toothgroupnetwork_tpu.pipelines import tgn as tgn_mod
    from toothgroupnetwork_tpu.postprocess import boundary as bmod
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    pipe, obj_path = setup_pipeline(args.dtype, args.n_side)
    # one full pipeline run: builds all the resident buffers + compiles
    out = pipe(obj_path)
    print(f"pipeline warm; n_vertices={len(out['sem'])}", flush=True)

    org_feats, bdl_feats = prep_scan_host_tgn(obj_path, pipe.n_sample)
    n0 = bdl_feats.shape[0]
    n = pipe.n_sample
    n_chunks = pb._FPS_CHUNKS
    ax = int(np.argmax(bdl_feats[:, :3].var(axis=0)))
    n_pad = -(-n0 // pb._FPS_BUCKET) * pb._FPS_BUCKET
    up_dt = (np.float16 if os.environ.get("TGN_TPU_UPLOAD", "f16") == "f16"
             else np.float32)
    pad = np.zeros((n_pad, 6), up_dt)
    pad[:n0] = bdl_feats
    pad_dev = jnp.asarray(pad)
    quota = -(-n // n_chunks)
    quota_pad = min(-(-quota // 128) * 128, -(-n0 // n_chunks))

    _, _, fused_fn = pb._fps_gather_jits()

    rows = []

    def bench(name, fn, *a, **kw):
        dt = chained_time(fn, *a, iters=args.iters, **kw)
        rows.append((name, dt * 1e3))
        print(f"{name:<44s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    # 1. fused mesh-prep FPS partition (sort + slab scatter + 16-slab pallas
    #    FPS + rank-interleaved gather)
    bench(f"fps_fused {n0}->{n} ({n_chunks} slabs, q{quota_pad})",
          lambda p: fused_fn(p, np.int32(n0), np.int32(ax),
                             quota_pad=quota_pad, n=n, n_chunks=n_chunks)[0],
          pad_dev)

    # the sampled cloud + stage-1-like inputs
    feats_dev, idx_dev, _fin = pb.fps_sample_dev(bdl_feats, n, return_idx=True)
    feats = jax.block_until_ready(feats_dev)[None]
    rng = np.random.default_rng(0)

    # 2. fps stage1 forward (argmax+moved fused, as the pipeline dispatches it)
    bench("fps stage1 (24k fwd + argmax/moved)",
          lambda f: pipe._fps_stage1(f), feats)

    # 3. fps stage2 (make_crops + fwd + device votes)
    cents = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * .3)
    valid = jnp.ones((1, 16), bool)
    bench("fps stage2 (crops+fwd+votes)",
          lambda f: pipe._fps_stage2(f, cents, valid), feats)

    # 4. purity program (k=40 purity + exact nn1 + speculative fps)
    labels = jnp.asarray(rng.integers(0, 17, n).astype(np.uint8))
    samp_xyz = feats[0]

    def purity(p):
        return bmod._purity_device_fn(p, samp_xyz, labels, 40, 0.7, n_valid=n0)

    bench(f"purity ({n_pad}x{n} k=40 + nn1 + specFPS)", purity, pad_dev)

    # 5. bdl fused (sel route: gather 24k rows + stage1 + crops + stage2 + votes)
    sel = jnp.asarray(rng.permutation(n0)[:n].astype(np.int32))
    bench("bdl fused_sel (gather+stage1+crops+stage2)",
          lambda p: pipe._bdl_fused_sel(p, sel, cents, valid), pad_dev)

    # 6. boundary-half 1-NN (padded org x 20k boundary)
    num_bdl = pipe.boundary_info["num_of_bdl_points"]
    bench(f"bdl_nn1_sel ({n_pad}x{num_bdl})",
          lambda p: tgn_mod._bdl_nn1_sel_fn(p, sel, 18000, num_bdl), pad_dev)

    # 7. final transfer (combine + label gather)
    full_fn, _ = tgn_mod._final_transfer_fns()
    nn1 = jnp.asarray(rng.integers(0, n, n_pad).astype(np.int32))
    nn1_d2 = jnp.asarray(rng.random(n_pad).astype(np.float32))
    nn_b = jnp.asarray(rng.integers(0, num_bdl, n_pad).astype(np.int32))
    d_b2 = jnp.asarray(rng.random(n_pad).astype(np.float32))
    ins_pad = jnp.asarray(rng.integers(0, 17, n + num_bdl).astype(np.uint8))

    bench("final transfer (combine+gather)",
          lambda d2: full_fn(nn1, d2, nn_b, d_b2, ins_pad, ins_pad,
                             jnp.int32(n)),
          nn1_d2)

    total = sum(ms for _, ms in rows)
    print(f"\n{'DEVICE-COMPUTE TOTAL':<44s} {total:9.2f} ms "
          f"(= {1e3 / total:.2f} scans/s ceiling if device-bound)")


if __name__ == "__main__":
    main()
