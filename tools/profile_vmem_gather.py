"""Can Mosaic gather from a VMEM-resident table? (r5 attention-gather attack)

The crop-stage attention gather reads [B*N*K, C] rows from a per-batch
[3072, C] table. XLA's HBM gather pays full-tile read amplification
(~4 KB per 64 B bf16 row -> ~7 GB of HBM for a 113 MB output, measured
~21 ms/block). The table is 192 KB — VMEM-resident. If an in-kernel gather
(jnp.take / take_along_axis on the VMEM ref) lowers to something fast, the
whole neighbor-gather floor collapses to ~10 MB of HBM per block.

This micro-benchmarks, per variant, gather of [N, K] neighbor rows from a
[N, C] table at the flagship crop shape (B16, N3072, K36, C32, bf16):
  xla    — jnp.take on HBM (status quo, for reference)
  vmem   — pallas kernel, full table in VMEM, jnp.take inside
If 'vmem' compiles and beats 'xla', wire it into the attention path.
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from toothgroupnetwork_tpu.utils.compile_cache import ensure_compile_cache
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    ensure_compile_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    B, N, K, C = 16, 3072, 36, 32
    idx_np = rng.integers(0, N, size=(B, N, K), dtype=np.int32)
    idx = jnp.asarray(idx_np)

    def xla_gather(x):
        return jnp.take_along_axis(
            x[:, :, None, :], idx[..., None].astype(jnp.int32), axis=1
        ) if False else jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(
            x, idx.reshape(B, N * K))

    # pallas: grid over batch; table block [N, C] resident; idx block
    # [N*K] rows; out [N*K, C]
    TRK = N * K

    def kern(tab_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take(tab_ref[0], idx_ref[0], axis=0)

    def vmem_gather(x):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TRK), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TRK, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, TRK, C), x.dtype),
            interpret=jax.default_backend() not in ("tpu", "axon"),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(x.reshape(B, N, C), idx.reshape(B, TRK))

    x0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    # correctness first (small fetch: compare a checksum)
    try:
        a = xla_gather(x0).reshape(B, TRK, C)
        v = vmem_gather(x0)
        same = bool(jnp.all(a == v))
        print(f"exact match: {same}", flush=True)
    except Exception as e:
        print(f"vmem gather FAILED to build/run: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        return

    for name, fn in [("xla", xla_gather), ("vmem", vmem_gather)]:
        dt = chained_time(fn, x0, iters=8)
        print(f"  {name:<5s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
