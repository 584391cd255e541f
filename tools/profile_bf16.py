"""Targeted bf16 device-path profile — where do stage-1's ~71 ms actually go?

The round-2 lore ("gathers at 60-90 GB/s dominate, ~19.6 ms/layer at 24k")
predates the bf16 default; the cell-attention A/B (tools/bench_cells.py)
showed bdl stage-1 at ~7 ms/block all-in, so the breakdown needs re-measuring
before any further kernel work. Run ALONE on the TPU.

Components timed (chained, bf16 where the model runs bf16):
  * PointTransformerBlock fwd at each flagship (N, K, C)
  * self-kNN / FPS ladders
  * full tgnet stage1 / stage2 / make_crops
  * MultiHead + 1-NN upsample + TransitionUp interpolate
  * train step at 24k B=1 (f32) + cost_analysis bytes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from toothgroupnetwork_tpu.models import get_task
    from toothgroupnetwork_tpu.models.point_transformer.backbone import (
        PointTransformerBlock)
    from toothgroupnetwork_tpu.models.tgnet import TGNet, make_crops
    from toothgroupnetwork_tpu.ops import farthest_point_sample, knn_points
    from toothgroupnetwork_tpu.utils.profiling import chained_time, cost_bytes

    quick = "--quick" in sys.argv
    iters = 5 if quick else 10
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def bench(name, fn, *args):
        t0 = time.time()
        dt = chained_time(fn, *args, iters=iters)
        print(f"{name:<44s} {dt * 1e3:8.2f} ms   (compile {time.time()-t0-dt*iters*2:.0f}s)",
              flush=True)
        return dt

    # ---- attention blocks at flagship shapes, bf16 ----
    for bb, nn_, kk, cc in [(1, 24000, 36, 32), (1, 24000, 36, 16),
                            (1, 24000, 24, 32), (1, 6000, 24, 64)]:
        blk = PointTransformerBlock(planes=cc, dtype=jnp.bfloat16)
        pp = jnp.asarray(rng.standard_normal((bb, nn_, 3)) * 0.2, jnp.float32)
        xx = jnp.asarray(rng.standard_normal((bb, nn_, cc)) * 0.2,
                         jnp.bfloat16)
        kidx, _ = knn_points(pp, pp, kk, include_self=True, need_dist=False)
        kidx = jax.block_until_ready(kidx)
        vs = jax.jit(blk.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), pp, xx, kidx, None, train=False)

        def blk_fwd(x, v=vs, b=blk, p=pp, ki=kidx):
            return b.apply(v, p, x, ki, None, False)

        bench(f"ptblock bf16 B{bb} N{nn_} K{kk} C{cc}", blk_fwd, xx)

        # gather-only cost at the same shape (the layer's raw x gather)
        def gather_only(x, ki=kidx):
            from toothgroupnetwork_tpu.ops import index_points

            return index_points(x, ki)

        bench(f"  gather only [N{nn_} K{kk} C{cc}] bf16", gather_only, xx)

    p24 = jnp.asarray(rng.standard_normal((1, 24000, 3)) * 0.3, jnp.float32)
    # ---- kNN / FPS ----
    bench("knn self 24000 k=36 (idx only)",
          lambda x: knn_points(x, x, 36, include_self=True,
                               need_dist=False)[0], p24)
    bench("fps 24000->6000", lambda x: farthest_point_sample(x[0], 6000), p24)

    # ---- full model pieces (bf16 config) ----
    task = get_task("tgnet_fps")
    config = task.default_config()
    config.model_parameter["dtype"] = "bfloat16"
    module = task.build_module(config)
    feat = jnp.asarray(rng.standard_normal((1, 24000, 6)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 16, (1, 24000)), jnp.int32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feat, None, train=False, labels=labels)
    centroids = jnp.asarray(rng.standard_normal((1, 16, 3)) * 0.3, jnp.float32)
    valid = jnp.ones((1, 16), bool)

    def stage1(f):
        o = module.apply(variables, f, None, method=TGNet.stage1)
        return o["sem_1"], o["offset_1"]

    def crops_fn(f):
        return make_crops(f, centroids, valid, 3072)[0]

    crops0, crop_mask, _, _ = make_crops(feat, centroids, valid, 3072)

    def stage2(c):
        return module.apply(variables, c, crop_mask, method=TGNet.stage2)["sem_1"]

    bench("tgnet stage1 (24k, bf16)", stage1, feat)
    bench("make_crops 16x3072", crops_fn, feat)
    bench("tgnet stage2 (16x3072, bf16)", stage2, crops0)
    print(f"stage1 bytes accessed: {cost_bytes(stage1, feat)/1e9:.2f} GB",
          flush=True)
    print(f"stage2 bytes accessed: {cost_bytes(stage2, crops0)/1e9:.2f} GB",
          flush=True)

    # ---- bdl model (stride 1,1) ----
    bdl = TGNet(crop_size=3072, c=6, planes=(16, 32), stride=(1, 1),
                nsample=(36, 24), blocks=(2, 3), block_num=2,
                dtype=jnp.bfloat16)
    bvs = jax.jit(bdl.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feat, None, train=False, labels=labels)

    def bdl1(f):
        o = bdl.apply(bvs, f, None, method=TGNet.stage1)
        return o["sem_1"], o["offset_1"]

    bench("bdl stage1 (24k, bf16)", bdl1, feat)
    print(f"bdl stage1 bytes accessed: {cost_bytes(bdl1, feat)/1e9:.2f} GB",
          flush=True)

    if quick:
        return

    # ---- train step 24k B=1 f32 (verdict item 4 baseline) ----
    from toothgroupnetwork_tpu.train.train_state import create_train_state
    from toothgroupnetwork_tpu.train.trainer import make_train_step

    cfg_t = task.default_config()
    mod_t = task.build_module(cfg_t)
    batch = {"feat": np.asarray(feat), "gt_seg_label": np.asarray(labels),
             "mask": np.ones((1, 24000), bool)}
    state = create_train_state(mod_t, cfg_t.optimizer, batch,
                               jax.random.PRNGKey(0),
                               task.forward_kwargs(batch))
    step = jax.jit(make_train_step(task, cfg_t), donate_argnums=0)
    t0 = time.time()
    state, vals = jax.block_until_ready(step(state, batch))
    print(f"train step compile+first: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    n = 5
    for _ in range(n):
        state, vals = step(state, batch)
    jax.block_until_ready(vals)
    print(f"train step (24k B=1 f32): {(time.time()-t0)/n*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
