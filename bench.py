"""Benchmark: flagship tgnet END-TO-END scans/sec/chip (100k-vertex scans).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json north star = 10 scans/sec/chip END-TO-END on TPU v5e.

The headline metric is the full pipeline (tools/bench_e2e.py harness): mesh
prep (obj parse, dedup, normals, 100k->24k FPS), both device stages of both
models, host clustering/boundary/fusion, 1-NN transfer — measured via
``run_many`` overlapped serving. ``vs_baseline`` is computed from THIS number
(round-2 verdict weak item 1: the device-path-only metric flattered it).
The device path (stage1 + 16-crop stage2, chained timing) is also reported
under ``device_path_scans_per_sec``.

Runs the TPU inference configuration: bfloat16 compute dtype (params, geometry,
and logits stay float32; stage-1 argmax agreement vs f32 is 98.8%) with the
default per-shape kernel dispatch (Pallas lane-packed attention on the batched
crop stage, Pallas FPS, approx_max_k + exact re-score kNN).

TGN_BENCH_MODE=device skips the end-to-end harness (device path only).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 10.0


def device_path_scans_per_sec():
    import jax
    import jax.numpy as jnp

    # the pipeline constructors enable this for the e2e half; the device-path
    # loop compiles BEFORE any pipeline exists, so enable it here too (cold
    # 24k compiles through the tunnel are ~10 min; the driver re-runs bench.py
    # in a fresh process at end of round)
    from toothgroupnetwork_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()

    from toothgroupnetwork_tpu.models import get_task
    from toothgroupnetwork_tpu.models.tgnet import TGNet, make_crops

    task = get_task("tgnet_fps")
    config = task.default_config()
    config.model_parameter["dtype"] = "bfloat16"
    module = task.build_module(config)

    n = 24000
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, n, 6)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 16, (1, n)), jnp.int32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feat, None, train=False, labels=labels)

    centroids = jnp.asarray(rng.standard_normal((1, 16, 3)) * 0.3, jnp.float32)
    valid = jnp.ones((1, 16), bool)

    @jax.jit
    def device_path(feat, centroids, valid):
        out1 = module.apply(variables, feat, None, method=TGNet.stage1)
        crops, crop_mask, crop_idx, _ = make_crops(
            feat, centroids, valid, 3072)
        out2 = module.apply(variables, crops, crop_mask, method=TGNet.stage2)
        return (jnp.argmax(out1["sem_1"], -1), out1["offset_1"],
                jnp.argmax(out2["sem_1"], -1), crop_idx)

    # Chained timing (utils/profiling.py methodology): each iteration's input
    # depends on the previous output so the n-iteration loop compiles to ONE
    # device program with a single readback — per-dispatch tunnel overheads
    # otherwise inflate the number ~15%. The dep SUMS every output element
    # (r4: single-element deps let XLA DCE whole backbones — see
    # utils/profiling.py:_dep_scalar).
    n_iters = 20

    @jax.jit
    def loop(f):
        def body(_, carry):
            outs = device_path(carry, centroids, valid)
            dep = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return carry * (jnp.float32(1.0) + dep * jnp.float32(1e-30))

        return jax.lax.fori_loop(0, n_iters, body, f)

    r = loop(feat)  # warmup/compile
    _ = np.asarray(r[0, 0, 0])
    t0 = time.perf_counter()
    r = loop(feat)
    _ = np.asarray(r[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    return 1.0 / dt


def main():
    scans_dev = device_path_scans_per_sec()

    if os.environ.get("TGN_BENCH_MODE") == "device":
        print(json.dumps({
            "metric": "tgnet_device_path_scans_per_sec_per_chip_24k",
            "value": round(scans_dev, 3),
            "unit": "scans/sec/chip",
            "vs_baseline": round(scans_dev / BASELINE_SCANS_PER_SEC, 3),
        }))
        return

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from bench_e2e import measure, setup_pipeline

    pipe, obj_path = setup_pipeline("bfloat16")
    res = measure(pipe, obj_path, runs=2, overlap=6, verbose=True)
    scans_e2e = res["scans_per_sec"]
    print(json.dumps({
        "metric": "tgn_e2e_scans_per_sec_per_chip_100k_vertex_scans",
        "value": round(scans_e2e, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_e2e / BASELINE_SCANS_PER_SEC, 3),
        "device_path_scans_per_sec": round(scans_dev, 3),
        "scans_per_sec_by_workers": res.get("scans_per_sec_by_workers"),
    }))


if __name__ == "__main__":
    main()
