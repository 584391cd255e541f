"""MXU one-hot row gather: ``out[b, m, k*C:(k+1)*C] = x[b, idx[b, m, k], :]``.

The serving backbone's floor is the per-layer kNN row gather (CLAUDE.md:
~60-90 GB/s effective on XLA's gather — 8-sublane tile read amplification;
the crop-stage [16·3072·36, 32] bf16 gather measured 18-29 ms for 113 MB
useful). This kernel reformulates the gather as MXU matmuls with FULL lane
utilization via a two-level index factorization:

  idx = hi * 128 + lo   (hi = idx >> 7, lo = idx & 127)

  tmp[r, j*C + c] = sum_l onehot(lo[r])[l] * xT[l, j*C + c]
                  = x[j*128 + lo[r], c]          # one [TM,128]@[128,NB*C] dot
  out[r, c]       = tmp[r, hi[r]*C + c]          # VPU block-select over NB

where ``xT [128, NB*C]`` is the source cloud transposed so the 128 possible
``lo`` values lie on the CONTRACTION axis and all ``NB*C`` lanes are live —
the naive ``onehot(idx) [R, N] @ x [N, C]`` form leaves 3/4 of the MXU's
output lanes dead at C=32 (and XLA rewrites it back into a gather anyway,
r4 A4 measurement: 25.5 ms). Total FLOPs = rows·N·C·2 — 347 GFLOP at the
crop shape ≈ 1.8 ms of MXU at full utilization, vs 18-29 ms for the strided
reads it replaces.

Exactness: each contraction has exactly ONE nonzero term (0/1 weights are
exact in bf16; 1·x = x exactly; accumulating zeros is exact), so the result
is bit-identical to ``index_points`` for bf16 sources. f32 sources would pay
8x MXU throughput — callers keep XLA's gather there.

Output layout is LANE-PACKED ``[B, M, K*C]`` — the layout the fused
attention kernel consumes directly ([B·M·K, C] is the same HBM bytes, a free
reshape). Replaces the CUDA grouping kernel's role on this path (reference:
pointops grouping, models/modules/pointops/src/grouping/).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(xt_ref, idx_ref, o_ref, *, kk: int, nb: int, c: int):
    f32 = jnp.float32
    xt = xt_ref[0]                                   # [128, NB*C] (src dtype)
    idx = idx_ref[0]                                 # [TM, Kpad] int32
    tm = idx.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, 128), 1)
    for k in range(kk):
        col = jax.lax.slice(idx, (0, k), (tm, k + 1))        # [TM, 1]
        lo = jax.lax.bitwise_and(col, 127)
        hi = jax.lax.shift_right_logical(col, 7)
        ohlo = (lo == lane).astype(xt.dtype)                 # [TM, 128]
        tmp = jnp.dot(ohlo, xt, preferred_element_type=f32)  # [TM, NB*C]
        acc = jnp.zeros((tm, c), f32)
        for j in range(nb):
            blk = jax.lax.slice(tmp, (0, j * c), (tm, (j + 1) * c))
            acc = acc + jnp.where(hi == j, blk, 0.0)
        o_ref[0, :, k * c:(k + 1) * c] = acc.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("tile_m",))
def onehot_gather_packed(x, idx, *, tile_m: int | None = None):
    """``x [B, N, C]`` (bf16 recommended), ``idx [B, M, K]`` int32 with values
    in ``[0, N)`` -> ``[B, M, K*C]`` in ``x.dtype``, bit-equal to
    ``index_points(x, idx).reshape(B, M, K*C)``.

    Requirements: C a multiple of the lane-tile granularity niceties is NOT
    needed (any C works — NB*C lanes just pad), but N is padded up to a
    multiple of 128 internally. Compile-time scales with K * ceil(N/128)
    (unrolled block-select), so this is for sources that fit VMEM after the
    transpose — the backbone's per-crop (3072) and full-res (24000) clouds.
    """
    b, n, c = x.shape
    _, m, kk = idx.shape
    n128 = -(-n // 128) * 128
    nb = n128 // 128
    if n128 != n:
        x = jnp.pad(x, ((0, 0), (0, n128 - n), (0, 0)))
    # [B, N, C] -> [B, 128, NB*C]: lane-position-major source rows
    xt = jnp.transpose(x.reshape(b, nb, 128, c), (0, 2, 1, 3)
                       ).reshape(b, 128, nb * c)

    if tile_m is None:
        # scoped-vmem budget: tmp [TM, NB*C] f32 + xt [128, NB*C] + out
        # [TM, K*C]; keep tmp around <=4 MB
        tile_m = max(8, min(256, (4 << 20) // (4 * nb * c)))
        tile_m -= tile_m % 8
    tm = min(tile_m, -(-m // 8) * 8)
    pad_m = -(-m // tm) * tm - m
    if pad_m:
        idx = jnp.pad(idx, ((0, 0), (0, pad_m), (0, 0)))
    mt = (m + pad_m) // tm

    out = pl.pallas_call(
        partial(_gather_kernel, kk=kk, nb=nb, c=c),
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec((1, 128, nb * c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, kk), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, kk * c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m + pad_m, kk * c), x.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xt, idx)
    return out[:, :m]


def onehot_gather(x, idx, **kw):
    """``index_points``-shaped entry: ``[B, N, C]``, ``[B, M, K]`` ->
    ``[B, M, K, C]``."""
    b, n, c = x.shape
    _, m, kk = idx.shape
    return onehot_gather_packed(x, idx, **kw).reshape(b, m, kk, c)
