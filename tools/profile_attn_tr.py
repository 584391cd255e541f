"""TR (row-tile) sweep of the packed-x fused attention kernel (r5).

The r4 default TR=128 came from Mosaic's ~16 MB scoped-vmem cap and left the
kernel latency-bound: 384 sequential grid steps x a ~10-matmul dependency
chain = 22.9 ms/block at B16/3072/K36/C32 vs a ~3-5 ms FLOP+traffic floor.
v5e has 128 MB VMEM; this sweeps TR with the matching vmem_limit_bytes to
find the new default. Chained, DCE-proof, kernel-only (the gather runs inside
the chained fn so the input tensor is regenerated per iteration).

Usage: python tools/profile_attn_tr.py [--iters 8]
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

    from toothgroupnetwork_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()

    from toothgroupnetwork_tpu.ops.pallas.attention_kernel import (
        fused_vector_attention_packed_x, fold_attention_params)
    from toothgroupnetwork_tpu.models.point_transformer.backbone import (
        PointTransformerLayer)
    from toothgroupnetwork_tpu.ops import knn_points
    from toothgroupnetwork_tpu.ops.gather import gather_neighbors
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # the three on-path packed shapes: fps-s2 stage0, bdl-s2 stage0, bdl-s2
    # stage1 (stride-1 arch keeps N=3072)
    shapes = [(16, 3072, 36, 32), (16, 3072, 36, 16), (16, 3072, 24, 32)]
    for (b, n, kk, cc) in shapes:
        pp = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)
                         * 0.3)
        xx = (jnp.asarray(rng.standard_normal((b, n, cc)).astype(np.float32)
                          * 0.2)).astype(jnp.bfloat16)
        kidx, _ = knn_points(pp, pp, kk, include_self=True, need_dist=False,
                             sel_bf16=True)
        kidx = jax.block_until_ready(kidx)

        lay = PointTransformerLayer(planes=cc, dtype=jnp.bfloat16)
        vs = lay.init(jax.random.PRNGKey(0), pp, xx, kidx, None, train=True)
        params = fold_attention_params(vs)
        print(f"\n[B{b} N{n} K{kk} C{cc}] bf16 packed-x kernel "
              f"(incl. gather)", flush=True)

        for tr in (128, 256, 512, None):
            def run(x, _tr=tr):
                # gather inside the chain: [B,N,K,C] rows of x (bf16)
                x_g = gather_neighbors(x, kidx)          # [B, N, K, C]
                q = x.reshape(b * n, cc)
                xg = x_g.reshape(b * n * kk, cc)
                p_g = gather_neighbors(pp, kidx)
                p_r = (p_g - pp[:, :, None, :]).reshape(b * n * kk, 3)
                out = fused_vector_attention_packed_x(
                    q, xg.astype(jnp.bfloat16), p_r, params, k=kk,
                    tile_rows=_tr, out_dtype=jnp.bfloat16)
                return out.reshape(b, n, cc)

            try:
                dt = chained_time(jax.jit(run), xx, iters=args.iters)
                print(f"  TR={str(tr):>5s}  {dt * 1e3:8.2f} ms", flush=True)
            except Exception as e:  # OOM at big TR: record and continue
                print(f"  TR={str(tr):>5s}  FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
