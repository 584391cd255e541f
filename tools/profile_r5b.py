"""Round-5 follow-up re-pin: the in-pipe numbers under the CURRENT defaults
(flat stage self-kNN, bf16-out packed-x attention) plus the mesh-prep fused
FPS chained pin (verdict item 7).

profile_r5.py's first pass found the r4 regression (windowed stage self-kNN
slower than flat at both backbone shapes) and the default was flipped; its
section C/D numbers predate the bf16-out attention change. This re-pins:
  * serial phase walls with dispatch/fetch sub-splits (2 runs),
  * chained device programs (fps_stage1/fps_stage2/bdl_fused_sel),
  * purity WINDOW + bdl_nn1 WINDOW (on-path variants only),
  * the fused-partition mesh-prep FPS program, chained (r4's number was
    noisy 28.9/15.6; STATUS r5 wall 66.0 ms).

Usage: python tools/profile_r5b.py [--out /tmp/r5b_profile.txt] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

OUT = None


def log(msg: str):
    print(msg, flush=True)
    OUT.write(msg + "\n")
    OUT.flush()


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5b_profile.txt")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    OUT = open(args.out, "a", buffering=1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import setup_pipeline
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    log(f"=== profile_r5b start {time.strftime('%H:%M:%S')} "
        f"backend={jax.default_backend()} ===")

    rng = np.random.default_rng(0)
    cents = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * .3)
    valid = jnp.ones((1, 16), bool)

    t0 = time.perf_counter()
    pipe, obj_path = setup_pipeline("bfloat16")
    out = pipe(obj_path)  # warm + build resident buffers
    log(f"[default env] warm in {time.perf_counter() - t0:.0f}s "
        f"n_vertices={len(out['sem'])}")
    log("  variants: " + ", ".join(
        f"{k}={v}" for k, v in pipe.variants().items()))

    # ---- serial phase walls (with sub-splits) ----
    acc: dict[str, float] = {}
    runs = 3
    for _ in range(runs):
        t0 = time.perf_counter()
        pipe(obj_path)
        acc["WALL"] = acc.get("WALL", 0.0) + time.perf_counter() - t0
        for k, v in pipe.timings.items():
            acc[k] = acc.get(k, 0.0) + v
    log(f"  serial phase walls ({runs} runs):")
    for k in sorted(acc, key=lambda k: -acc[k]):
        log(f"    {k:<40s} {acc[k] / runs * 1e3:9.1f} ms")
    psum = sum(v for k, v in acc.items() if "/" not in k and k != "WALL")
    log(f"    {'PHASE SUM':<40s} {psum / runs * 1e3:9.1f} ms")

    # ---- chained device programs ----
    from toothgroupnetwork_tpu.data.scan_prep import prep_scan_host_tgn
    from toothgroupnetwork_tpu.pipelines import base as pb
    from toothgroupnetwork_tpu.pipelines import tgn as tgn_mod
    from toothgroupnetwork_tpu.postprocess import boundary as bmod

    org_feats, bdl_feats = prep_scan_host_tgn(obj_path, pipe.n_sample)
    n0, n = bdl_feats.shape[0], pipe.n_sample
    n_pad = -(-n0 // 8192) * 8192
    up_dt = (np.float16 if os.environ.get("TGN_TPU_UPLOAD", "f16") == "f16"
             else np.float32)
    pad = np.zeros((n_pad, 6), up_dt)
    pad[:n0] = bdl_feats
    pad_dev = jnp.asarray(pad)
    feats_dev, _idx, _fin = pb.fps_sample_dev(bdl_feats, n, return_idx=True)
    feats = jax.block_until_ready(feats_dev)[None]
    sel = jnp.asarray(rng.permutation(n0)[:n].astype(np.int32))
    labels = jnp.asarray(rng.integers(0, 17, n).astype(np.uint8))
    num_bdl = pipe.boundary_info["num_of_bdl_points"]

    mod, vs = pipe.fps_module, pipe.fps_vars

    def s1(f):
        cls_out = mod.apply(vs, f, None, method=type(mod).stage1)
        cls = jnp.argmax(cls_out["sem_1"], -1).astype(jnp.uint8)
        moved = (f[..., :3] + cls_out["offset_1"]).astype(jnp.float16)
        return cls, moved

    log(f"  chained device programs ({args.iters} iters):")
    for name, fn, a0 in [
        ("fps_stage1 (24k fwd)", jax.jit(s1), feats),
        ("fps_stage2 (crops+fwd+votes)",
         lambda f: pipe._fps_stage2(f, cents, valid), feats),
        ("bdl_fused_sel (stage1+crops+stage2)",
         lambda p: pipe._bdl_fused_sel(p, sel, cents, valid), pad_dev),
        ("purity WINDOW (on-path)",
         lambda p: bmod._purity_window_fn(p, feats[0], labels, 40, 0.7,
                                          n_valid=n0), pad_dev),
        ("bdl_nn1 WINDOW (on-path)",
         lambda p: tgn_mod._bdl_nn1_win_fn(p, sel, 18000, n0, num_bdl),
         pad_dev),
    ]:
        # tunnel flakes ("response body closed") must not kill the batch:
        # retry once, then record the failure and move on
        for attempt in (1, 2):
            try:
                dt = chained_time(fn, a0, iters=args.iters)
                log(f"    {name:<42s} {dt * 1e3:9.2f} ms")
                break
            except Exception as e:
                if attempt == 2:
                    log(f"    {name:<42s} FAILED {type(e).__name__}")
                else:
                    time.sleep(20)

    # ---- mesh-prep fused FPS, chained (verdict item 7 re-pin) ----
    exact_fn, chunked_fn, fused_fn = pb._fps_gather_jits()
    n_chunks = pb._FPS_CHUNKS
    ax = int(np.argmax(bdl_feats[:, :3].var(axis=0)))
    quota = -(-n // n_chunks)
    quota_pad = min(-(-quota // 128) * 128, -(-n0 // n_chunks))

    def fused_prog(p):
        return fused_fn(p, np.int32(n0), np.int32(ax),
                        quota_pad=quota_pad, n=n, n_chunks=n_chunks)

    dt = chained_time(fused_prog, pad_dev, iters=args.iters)
    log(f"    {'mesh-prep fused FPS (chained)':<42s} {dt * 1e3:9.2f} ms")

    # decompose: the in-program argsort vs the batched FPS loop vs the rest
    npad = pad_dev.shape[0]

    def sort_only(p):
        key = jnp.where(jnp.arange(npad) < n0,
                        p[:, ax].astype(jnp.float32), jnp.inf)
        return jnp.argsort(key).astype(jnp.int32)

    dt = chained_time(sort_only, pad_dev, iters=args.iters)
    log(f"    {'  argsort 104k (chained)':<42s} {dt * 1e3:9.2f} ms")

    from toothgroupnetwork_tpu.ops import farthest_point_sample

    chunk_pad = npad // n_chunks
    slab_pts = jnp.asarray(
        rng.standard_normal((n_chunks, chunk_pad, 3)).astype(np.float32))
    slab_msk = jnp.ones((n_chunks, chunk_pad), bool)

    def fps_only(p):
        return farthest_point_sample(p, quota_pad, slab_msk)

    dt = chained_time(fps_only, slab_pts, iters=args.iters)
    log(f"    {'  batched slab FPS (chained)':<42s} {dt * 1e3:9.2f} ms")

    log(f"=== profile_r5b done {time.strftime('%H:%M:%S')} ===")


if __name__ == "__main__":
    main()
