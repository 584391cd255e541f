"""Train-step profile: flagship tgnet_fps at 24k B=1, f32 vs bf16 backbone.

Usage: python tools/profile_train.py [--quick] [--dtype f32|bf16|both]

Methodology (CLAUDE.md): the step is chained through the TRAIN STATE inside one
compiled fori_loop (that is the real epoch dependency structure — each step
consumes the previous step's params), one scalar readback at the end, divide by
iters. cost_analysis bytes locate the bandwidth monsters; tunnel timings of
single dispatches do not.

Round-2 verdict item 4 baseline: 542 ms/step f32, 203.6 GB accessed (~2x the
v5e BW floor of ~819 GB/s * 0.12 s).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from toothgroupnetwork_tpu.models import get_task
from toothgroupnetwork_tpu.train.train_state import create_train_state
from toothgroupnetwork_tpu.train.trainer import make_train_step


def build(dtype: str):
    # Trainer normally enables the persistent XLA cache; this harness calls
    # make_train_step directly, so enable it here (cold compiles of the 24k
    # train step through the tunnel are minutes)
    from toothgroupnetwork_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    task = get_task("tgnet_fps")
    config = task.default_config()
    if dtype == "bf16":
        config.model_parameter["dtype"] = "bfloat16"
    module = task.build_module(config)

    n = 24000
    rng = np.random.default_rng(0)
    batch = {
        "feat": rng.standard_normal((1, n, 6)).astype(np.float32) * 0.3,
        "gt_seg_label": rng.integers(-1, 16, (1, n)).astype(np.int32),
        "mask": np.ones((1, n), bool),
    }
    state = create_train_state(module, config.optimizer, batch,
                               jax.random.PRNGKey(0),
                               task.forward_kwargs(batch))
    step = make_train_step(task, config)
    return state, step, batch


def profile(dtype: str, iters: int):
    state, step, batch = build(dtype)
    db = {k: jnp.asarray(v) for k, v in batch.items()}

    def one(s):
        s, _ = step(s, db)
        return s

    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, iters, lambda _, c: one(c), s)

    # bytes: compile the SINGLE step for cost analysis (the loop multiplies it)
    compiled = jax.jit(lambda s: one(s)).lower(state).compile()
    ca = compiled.cost_analysis()
    gb = ca.get("bytes accessed", float("nan")) / 1e9
    flops = ca.get("flops", float("nan")) / 1e12

    s = loop(state)  # warmup/compile
    leaf = jax.tree_util.tree_leaves(s.params)[0]
    _ = np.asarray(leaf)[(0,) * leaf.ndim]
    t0 = time.perf_counter()
    s = loop(state)
    leaf = jax.tree_util.tree_leaves(s.params)[0]
    _ = np.asarray(leaf)[(0,) * leaf.ndim]
    dt = (time.perf_counter() - t0) / iters
    print(f"{dtype}: {dt * 1e3:8.1f} ms/step   {gb:7.1f} GB accessed   "
          f"{flops:6.2f} TFLOP   (bw-equiv {gb / dt:6.0f} GB/s)")
    return dt, gb


def main():
    quick = "--quick" in sys.argv
    iters = 5 if quick else 10
    which = "both"
    if "--dtype" in sys.argv:
        which = sys.argv[sys.argv.index("--dtype") + 1]
    print(f"backend={jax.default_backend()}")
    if which in ("f32", "both"):
        profile("f32", iters)
    if which in ("bf16", "both"):
        profile("bf16", iters)


if __name__ == "__main__":
    main()
