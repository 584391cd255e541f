"""Per-component timing breakdown of the flagship tgnet device path on TPU.

Usage: python tools/profile_flagship.py [--quick]

Prints a ms/component table (chained-timing methodology, utils/profiling.py) so
perf regressions can be triaged to a stage instead of one end-to-end number.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from toothgroupnetwork_tpu.models import get_task
from toothgroupnetwork_tpu.models.tgnet import TGNet, make_crops
from toothgroupnetwork_tpu.ops import farthest_point_sample, knn_points
from toothgroupnetwork_tpu.utils.profiling import chained_time, cost_bytes


def main():
    quick = "--quick" in sys.argv
    iters = 5 if quick else 10
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    task = get_task("tgnet_fps")
    config = task.default_config()
    module = task.build_module(config)

    n = 24000
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, n, 6)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 16, (1, n)), jnp.int32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feat, None, train=False, labels=labels)
    centroids = jnp.asarray(rng.standard_normal((1, 16, 3)) * 0.3, jnp.float32)
    valid = jnp.ones((1, 16), bool)

    rows = []

    def bench(name, fn, *args, **kw):
        dt = chained_time(fn, *args, iters=iters, **kw)
        rows.append((name, dt * 1e3))
        print(f"{name:<42s} {dt * 1e3:9.2f} ms")
        return dt

    # ---- whole stages ----
    def stage1(f):
        return module.apply(variables, f, None, method=TGNet.stage1)["sem_1"]

    crops0, crop_mask, _, _ = make_crops(feat, centroids, valid, 3072)

    def stage2(c):
        return module.apply(variables, c, crop_mask, method=TGNet.stage2)["sem_1"]

    def crops_fn(f):
        return make_crops(f, centroids, valid, 3072)[0]

    def full(f):
        out1 = module.apply(variables, f, None, method=TGNet.stage1)
        crops, cm, ci, _ = make_crops(f, centroids, valid, 3072)
        out2 = module.apply(variables, crops, cm, method=TGNet.stage2)
        return out1["sem_1"], out2["sem_1"]

    bench("FULL device path (stage1+crops+stage2)", full, feat)
    bench("stage1 fwd (B=1, 24k)", stage1, feat)
    bench("stage2 fwd (B=16, 3072)", stage2, crops0)
    bench("make_crops (16x3072 of 24k)", crops_fn, feat)

    # ---- ops: FPS ladder (B=1) ----
    p = feat[0, :, :3]
    sizes = [(24000, 6000), (6000, 1500), (1500, 375), (375, 93)]
    sub = p
    for src, dst in sizes:
        subp = sub[:src]
        bench(f"fps {src}->{dst}", lambda q, m=dst: farthest_point_sample(q, m), subp)
        sub = subp

    # ---- ops: self-kNN ladder ----
    ks = [(24000, 36), (6000, 24), (1500, 24), (375, 24), (93, 24)]
    for nn_, k in ks:
        q = p[:nn_]
        bench(f"knn self {nn_} k={k}", lambda x, kk=k: knn_points(x, x, kk,
                                                                  include_self=True), q)

    # ---- ops: cross-kNN calls the backbone makes (TransitionDown k=16,
    # 3-NN decoder interpolate, 1-NN head upsample) ----
    for mq, nc, k in [(6000, 24000, 16), (1500, 6000, 16), (375, 1500, 16)]:
        bench(f"knn cross {mq}q of {nc} k={k}",
              lambda x, m=mq, kk=k: knn_points(x[:m], x, kk), p[:nc])
    for mq, nc, k in [(24000, 6000, 3), (6000, 1500, 3), (24000, 6000, 1),
                      (24000, 1500, 1), (24000, 375, 1), (24000, 93, 1)]:
        bench(f"knn cross {mq}q of {nc} k={k}",
              lambda x, m=mq, n2=nc, kk=k: knn_points(x[:m], x[:n2], kk), p)

    # ---- ops: batched stage-2 ladder (B=16) ----
    pc = jnp.asarray(rng.standard_normal((16, 3072, 3)) * 0.2, jnp.float32)
    for src, dst in [(3072, 768), (768, 192), (192, 48), (48, 12)]:
        bench(f"fps B16 {src}->{dst}",
              lambda q, m=dst: farthest_point_sample(q, m), pc[:, :src])
    for nn_, k in [(3072, 36), (768, 24), (192, 24), (48, 24), (12, 24)]:
        bench(f"knn self B16 {nn_} k={k}",
              lambda x, kk=k: knn_points(x, x, kk, include_self=True),
              pc[:, :nn_])

    # ---- attention block micro-bench (stage-1 / stage-2 footprint sizes) ----
    from toothgroupnetwork_tpu.models.point_transformer.backbone import (
        PointTransformerBlock)

    for bb, nn_, kk, cc in [(1, 24000, 36, 32), (1, 6000, 24, 64),
                            (16, 3072, 36, 32), (16, 768, 24, 64)]:
        blk = PointTransformerBlock(planes=cc)
        pp = jnp.asarray(rng.standard_normal((bb, nn_, 3)) * 0.2, jnp.float32)
        xx = jnp.asarray(rng.standard_normal((bb, nn_, cc)) * 0.2, jnp.float32)
        kidx, _ = knn_points(pp, pp, kk, include_self=True)
        kidx = jax.block_until_ready(kidx)
        vs = jax.jit(blk.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), pp, xx, kidx, None, train=False)

        def blk_fwd(x, v=vs, b=blk, p=pp, ki=kidx):
            return b.apply(v, p, x, ki, None, False)

        bench(f"ptblock B{bb} N{nn_} K{kk} C{cc}", blk_fwd, xx)

    if not quick:
        gb = cost_bytes(stage1, feat) / 1e9
        print(f"stage1 bytes accessed: {gb:.1f} GB")
        gb2 = cost_bytes(stage2, crops0) / 1e9
        print(f"stage2 bytes accessed: {gb2:.1f} GB")

    print("\nsummary (ms):")
    for name, ms in rows:
        print(f"  {name:<42s} {ms:9.2f}")


if __name__ == "__main__":
    main()
