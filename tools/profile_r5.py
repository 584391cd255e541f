"""Round-5 reconciliation profile: driver-style phase walls (with the new
dispatch/fetch sub-splits) PLUS in-pipe chained A/Bs of every round-4 kernel
variant, in ONE process writing progressively to a file (CLAUDE.md: batch all
TPU measurements into one script; pipes buffer and die with timeouts).

The round-4 verdict's central flaw: isolated chained A/Bs claimed ~100 ms of
cuts (window purity, window bdl 1-NN, packed-x attention) while the driver
artifact regressed (bdl:fused_device 144->185 ms, fps:stage2 113.7->131.9).
This script measures the ACTUAL pipeline programs (pipe._fps_stage2,
pipe._bdl_fused_sel, ...) chained, under each env variant, so the phase walls
decompose into (queued-compute + fetch + dispatch) with nothing inferred from
standalone harnesses.

Usage: python tools/profile_r5.py [--out /tmp/r5_profile.txt] [--iters 8]
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


def serial_phases(pipe, obj_path, runs=2):
    acc: dict[str, float] = {}
    for _ in range(runs):
        t0 = time.perf_counter()
        pipe(obj_path)
        dt = time.perf_counter() - t0
        for k, v in pipe.timings.items():
            acc[k] = acc.get(k, 0.0) + v
        acc["WALL"] = acc.get("WALL", 0.0) + dt
    for k in sorted(acc, key=lambda k: -acc[k]):
        log(f"    {k:<40s} {acc[k] / runs * 1e3:9.1f} ms")
    psum = sum(v for k, v in acc.items() if "/" not in k and k != "WALL")
    log(f"    {'PHASE SUM':<40s} {psum / runs * 1e3:9.1f} ms")


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_profile.txt")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    OUT = open(args.out, "a", buffering=1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_e2e import setup_pipeline
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    log(f"=== profile_r5 start {time.strftime('%H:%M:%S')} "
        f"backend={jax.default_backend()} ===")

    rng = np.random.default_rng(0)
    cents = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * .3)
    valid = jnp.ones((1, 16), bool)

    def real_stage1(pipe):
        # setup_pipeline REPLACES pipe._fps_stage1 with the plausible-output
        # shim, whose jitted trace returns cached constants — the real forward
        # would be DCE'd under chained_time. Rebuild the production program.
        mod, vs = pipe.fps_module, pipe.fps_vars

        def s1(f):
            out = mod.apply(vs, f, None, method=type(mod).stage1)
            cls = jnp.argmax(out["sem_1"], -1).astype(jnp.uint8)
            moved = (f[..., :3] + out["offset_1"]).astype(jnp.float16)
            return cls, moved

        return jax.jit(s1)

    def chained_programs(pipe, tag, feats, pad_dev, sel):
        log(f"  [{tag}] chained device programs ({args.iters} iters):")
        for name, fn, a0 in [
            ("fps_stage1 (24k fwd)", real_stage1(pipe), feats),
            ("fps_stage2 (crops+fwd+votes)",
             lambda f: pipe._fps_stage2(f, cents, valid), feats),
            ("bdl_fused_sel (stage1+crops+stage2)",
             lambda p: pipe._bdl_fused_sel(p, sel, cents, valid), pad_dev),
        ]:
            dt = chained_time(fn, a0, iters=args.iters)
            log(f"    {name:<42s} {dt * 1e3:9.2f} ms")

    def build(tag, env: dict):
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        t0 = time.perf_counter()
        pipe, obj_path = setup_pipeline("bfloat16")
        out = pipe(obj_path)  # warm + build resident buffers
        log(f"[{tag}] env={env} warm in {time.perf_counter() - t0:.0f}s "
            f"n_vertices={len(out['sem'])}")
        log("  variants: " + ", ".join(
            f"{k}={v}" for k, v in pipe.variants().items()))
        return pipe, obj_path

    # ---------------- A: default env ----------------
    pipe, obj_path = build("A:default", {})
    log("  [A] serial phase walls (2 runs):")
    serial_phases(pipe, obj_path)

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

    chained_programs(pipe, "A", feats, pad_dev, sel)

    # purity window vs flat + bdl_nn1 window vs sel (env read per call /
    # module-scope jits independent of the pipeline instance)
    log("  [A] purity / bdl_nn1 variants (chained):")
    for name, fn in [
        ("purity WINDOW", lambda p: bmod._purity_window_fn(
            p, feats[0], labels, 40, 0.7, n_valid=n0)),
        ("purity FLAT", lambda p: bmod._purity_device_fn(
            p, feats[0], labels, 40, 0.7, n_valid=n0)),
        ("bdl_nn1 WINDOW", lambda p: tgn_mod._bdl_nn1_win_fn(
            p, sel, 18000, n0, num_bdl)),
        ("bdl_nn1 SEL", lambda p: tgn_mod._bdl_nn1_sel_fn(
            p, sel, 18000, num_bdl)),
    ]:
        dt = chained_time(fn, pad_dev, iters=args.iters)
        log(f"    {name:<42s} {dt * 1e3:9.2f} ms")

    # stage self-kNN window vs flat, standalone at the two pipe shapes
    from toothgroupnetwork_tpu.ops.knn import knn_points, knn_self_windowed

    log("  [A] stage self-kNN window vs flat (chained):")
    p24 = jnp.asarray(rng.standard_normal((1, 24000, 3)).astype(np.float32))
    p16 = jnp.asarray(rng.standard_normal((16, 3072, 3)).astype(np.float32))
    for name, fn, a0 in [
        ("self-kNN 1x24k k=36 WINDOW",
         lambda p: knn_self_windowed(p, 36, sel_bf16=True), p24),
        ("self-kNN 1x24k k=36 FLAT",
         lambda p: knn_points(p, p, 36, include_self=True, need_dist=False,
                              sel_bf16=True), p24),
        ("self-kNN 16x3072 k=36 WINDOW",
         lambda p: knn_self_windowed(p, 36, sel_bf16=True), p16),
        ("self-kNN 16x3072 k=36 FLAT",
         lambda p: knn_points(p, p, 36, include_self=True, need_dist=False,
                              sel_bf16=True), p16),
    ]:
        dt = chained_time(fn, a0, iters=args.iters)
        log(f"    {name:<42s} {dt * 1e3:9.2f} ms")

    # ---------------- B: attention XLA ----------------
    pipe_b, obj_b = build("B:attn=xla", {"TGN_TPU_ATTENTION": "xla"})
    chained_programs(pipe_b, "B", feats, pad_dev, sel)
    log("  [B] serial phase walls (2 runs):")
    serial_phases(pipe_b, obj_b)

    # ---------------- C: stage kNN flat ----------------
    pipe_c, obj_c = build("C:stageknn=flat", {"TGN_TPU_ATTENTION": None,
                                              "TGN_TPU_STAGE_KNN": "flat"})
    chained_programs(pipe_c, "C", feats, pad_dev, sel)
    log("  [C] serial phase walls (2 runs):")
    serial_phases(pipe_c, obj_c)

    # ---------------- D: both off (r3-like) ----------------
    pipe_d, obj_d = build("D:attn=xla,stageknn=flat",
                          {"TGN_TPU_ATTENTION": "xla",
                           "TGN_TPU_STAGE_KNN": "flat"})
    chained_programs(pipe_d, "D", feats, pad_dev, sel)
    log("  [D] serial phase walls (2 runs):")
    serial_phases(pipe_d, obj_d)

    log(f"=== profile_r5 done {time.strftime('%H:%M:%S')} ===")


if __name__ == "__main__":
    main()
