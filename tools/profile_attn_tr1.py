"""Minimal single-shape packed-x TR probe (r5): one compile, one chained
measurement, random indices (no kNN program). Usage:
  python tools/profile_attn_tr1.py [TR] [C] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    tr = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cc = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    kk = int(sys.argv[3]) if len(sys.argv) > 3 else 36

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()

    from toothgroupnetwork_tpu.ops.gather import index_points
    from toothgroupnetwork_tpu.ops.pallas.attention_kernel import (
        fused_vector_attention_packed_x)
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()} TR={tr} C={cc} K={kk}",
          flush=True)
    rng = np.random.default_rng(0)
    b, n = 16, 3072
    pp = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.3)
    xx = jnp.asarray(rng.standard_normal((b, n, cc)).astype(np.float32) * 0.2
                     ).astype(jnp.bfloat16)
    kidx = jnp.asarray(rng.integers(0, n, size=(b, n, kk), dtype=np.int32))
    params = {nm: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.2
              for nm, s in dict(
                  a0=(3, 3), b0=(3,), a1=(3, cc), b1=(cc,),
                  bn0_scale=(cc,), bn0_shift=(cc,), w0=(cc, cc // 8),
                  c0=(cc // 8,), bn1_scale=(cc // 8,), bn1_shift=(cc // 8,),
                  w1=(cc // 8, cc // 8), c1=(cc // 8,),
                  wk=(cc, cc), bk=(cc,), wv=(cc, cc), bv=(cc,)).items()}

    def run(x):
        x_g = index_points(x, kidx).reshape(b * n * kk, cc)
        p_r = (index_points(pp, kidx) - pp[..., None, :]
               ).reshape(b * n * kk, 3)
        out = fused_vector_attention_packed_x(
            x.reshape(b * n, cc), x_g, p_r, params, k=kk,
            tile_rows=tr, out_dtype=jnp.bfloat16)
        return out.reshape(b, n, cc)

    t0 = time.time()
    dt = chained_time(jax.jit(run), xx, iters=8)
    print(f"  packed_x TR={tr}: {dt * 1e3:8.2f} ms  "
          f"(total incl. compile {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
