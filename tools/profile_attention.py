"""Per-layer A/B of the vector-attention kernel modes at the serving shapes.

r4 recheck: stage2 fwd stayed ~88 ms after the from-x packed kernel landed —
either the kernel is not engaging, it is not faster, or the attention layers
are not where the forward's time goes. This measures ONE layer (and one full
block) in each mode at the two dominant shapes, DCE-proof chained.

Usage: python tools/profile_attention.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.models.point_transformer.backbone import (
        PointTransformerBlock, PointTransformerLayer)
    from toothgroupnetwork_tpu.ops import knn_points
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for (b, n, kk, cc) in [(16, 3072, 36, 32), (1, 24000, 36, 32)]:
        pp = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)
                         * 0.3)
        xx = jnp.asarray(rng.standard_normal((b, n, cc)).astype(np.float32)
                         * 0.2).astype(jnp.bfloat16)
        kidx, _ = knn_points(pp, pp, kk, include_self=True, need_dist=False,
                             sel_bf16=True)
        kidx = jax.block_until_ready(kidx)

        lay = PointTransformerLayer(planes=cc, dtype=jnp.bfloat16)
        vs = lay.init(jax.random.PRNGKey(0), pp, xx, kidx, None, train=True)
        blk = PointTransformerBlock(planes=cc, dtype=jnp.bfloat16)
        bvs = blk.init(jax.random.PRNGKey(0), pp, xx, kidx, None, train=True)

        print(f"\n[B{b} N{n} K{kk} C{cc}] bf16", flush=True)
        for mode in ("xla", "packed", "fused"):
            os.environ["TGN_TPU_ATTENTION"] = mode

            def run(x):
                return lay.apply(vs, pp, x, kidx, None, False)

            try:
                dt = chained_time(jax.jit(run), xx, iters=args.iters)
                print(f"  layer {mode:<7s} {dt * 1e3:8.2f} ms", flush=True)
            except Exception as e:  # VMEM blowups etc.
                print(f"  layer {mode:<7s} FAILED: {type(e).__name__}",
                      flush=True)

        for mode in ("xla", "packed"):
            os.environ["TGN_TPU_ATTENTION"] = mode

            def runb(x):
                return blk.apply(bvs, pp, x, kidx, None, False)

            dt = chained_time(jax.jit(runb), xx, iters=args.iters)
            print(f"  block {mode:<7s} {dt * 1e3:8.2f} ms", flush=True)

        # the pure gather floor at this shape
        @jax.jit
        def gather_only(x):
            from toothgroupnetwork_tpu.ops import index_points

            return index_points(x, kidx)

        dt = chained_time(gather_only, xx, iters=args.iters)
        print(f"  raw x gather            {dt * 1e3:8.2f} ms", flush=True)

        # per-stage kNN cost at this shape (computed once per stage, shared)
        @jax.jit
        def knn_only(p):
            i, _ = knn_points(p, p, kk, include_self=True, need_dist=False,
                              sel_bf16=True)
            return i

        dt = chained_time(knn_only, pp, iters=args.iters)
        print(f"  stage kNN               {dt * 1e3:8.2f} ms", flush=True)

    os.environ.pop("TGN_TPU_ATTENTION", None)


if __name__ == "__main__":
    main()
