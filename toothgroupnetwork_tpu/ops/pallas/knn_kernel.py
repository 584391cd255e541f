"""Pallas TPU kernel for exact k-nearest-neighbor selection.

TPU-native counterpart of the reference's CUDA ``knnquery`` kernel
(reference: external_libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108,
which maintains a per-thread best-k heap). The TPU analog processes a tile of
queries per grid step with the candidate cloud VMEM-resident: squared distances
for a candidate chunk come off the MXU ([TQ, C] x [C, TN]), and the running
best-k is maintained by k rounds of vectorized min-extraction over the
``[best | chunk]`` lane concatenation (no sort — Mosaic has no sort primitive,
and k << TN).

Status: exact and tested (tests/test_ops.py::TestPallasKNN), but the DEFAULT
kNN path stays ``ops/knn.py``'s approx_max_k + exact re-score: selection via
the PartialReduce hardware unit beats k·N VPU min-extraction at the flagship's
shapes. Select this kernel with ``TGN_TPU_KERNELS=pallas`` or ``impl='pallas'``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BIG = 3e38  # python float: a jnp scalar would be a captured constant in-kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _knn_kernel(q_ref, pts_ref, p2b_ref, out_ref, *, k: int, tn: int,
                n_pad: int):
    """q_ref [TQ, C]; pts_ref [C, Npad] (transposed, padded); p2b_ref [1, Npad]
    (|p|^2 + invalid bias, _BIG on pads); out_ref [TQ, K_pad] int32."""
    tq = q_ref.shape[0]
    kp = out_ref.shape[1]
    n_chunks = n_pad // tn

    q = q_ref[:]                                           # [TQ, C]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)             # [TQ, 1]

    best_d = jnp.full((tq, kp), _BIG, jnp.float32)
    best_i = jnp.zeros((tq, kp), jnp.int32)
    best_lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, kp), 1)
    cat_lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, kp + tn), 1)

    for ct in range(n_chunks):                             # static unroll
        pts = pts_ref[:, ct * tn:(ct + 1) * tn]            # [C, TN]
        cross = jnp.dot(q, pts, preferred_element_type=jnp.float32)
        d2 = q2 - 2.0 * cross + p2b_ref[0, ct * tn:(ct + 1) * tn][None, :]
        chunk_ids = (jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)
                     + ct * tn)

        cat_d = jnp.concatenate([best_d, d2], axis=1)      # [TQ, KP+TN]
        cat_i = jnp.concatenate([best_i, chunk_ids], axis=1)

        new_d = jnp.full((tq, kp), _BIG, jnp.float32)
        new_i = jnp.zeros((tq, kp), jnp.int32)
        for t in range(k):                                 # static unroll
            m = jnp.min(cat_d, axis=1, keepdims=True)      # [TQ, 1]
            # first lane attaining the min (ties -> lower candidate index:
            # best-so-far lanes come first and chunk ids ascend with lanes)
            sel = jnp.min(jnp.where(cat_d == m, cat_lanes, kp + tn),
                          axis=1, keepdims=True)
            hit = cat_lanes == sel
            idx_val = jnp.sum(jnp.where(hit, cat_i, 0), axis=1, keepdims=True)
            slot = best_lanes == t
            new_d = jnp.where(slot, m, new_d)
            new_i = jnp.where(slot, idx_val, new_i)
            cat_d = jnp.where(hit, _BIG, cat_d)
        best_d, best_i = new_d, new_i

    out_ref[:] = best_i


@partial(jax.jit, static_argnames=("k", "tile_q", "chunk_n"))
def knn_pallas_select(query: jnp.ndarray, points: jnp.ndarray, k: int,
                      p_mask: jnp.ndarray | None = None, *, tile_q: int = 256,
                      chunk_n: int = 2048) -> jnp.ndarray:
    """Exact top-k neighbor INDICES (ascending matmul-expansion distance, ties
    to the lower index): query [M, C], points [N, C] -> int32 [M, k]."""
    m, c = query.shape
    n = points.shape[0]
    keff = min(k, n)
    kp = _round_up(keff, _LANE)

    tq = min(tile_q, _round_up(m, 8))
    m_pad = _round_up(m, tq)
    tn = min(chunk_n, _round_up(n, _LANE))
    n_pad = _round_up(n, tn)

    qp = jnp.zeros((m_pad, c), jnp.float32).at[:m].set(
        query.astype(jnp.float32))
    pts_t = jnp.zeros((c, n_pad), jnp.float32).at[:, :n].set(
        points.astype(jnp.float32).T)
    p2 = jnp.sum(points.astype(jnp.float32) ** 2, axis=1)
    if p_mask is not None:
        p2 = jnp.where(p_mask.astype(bool), p2, _BIG)
    p2b = jnp.full((1, n_pad), _BIG, jnp.float32).at[0, :n].set(p2)

    out = pl.pallas_call(
        partial(_knn_kernel, k=keff, tn=tn, n_pad=n_pad),
        grid=(m_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, kp), jnp.int32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qp, pts_t, p2b)
    idx = out[:m, :keff]
    if keff < k:
        idx = jnp.concatenate([idx] + [idx[:, -1:]] * (k - keff), axis=1)
    return idx


def knn_pallas(query, points, k, q_mask=None, p_mask=None, *,
               include_self: bool = False, need_dist: bool = True):
    """Full kNN contract via the Pallas selection kernel: returns ``(idx,
    dist)`` with exact re-scored distances / self-inclusion semantics identical
    to the default path (ops/knn.py one_chunk finalize)."""
    from ..knn import finalize_selection

    idx = knn_pallas_select(query, points, k, p_mask)
    qi = jnp.minimum(jnp.arange(query.shape[0], dtype=jnp.int32),
                     points.shape[0] - 1)
    idx, dist = finalize_selection(
        query[None].astype(jnp.float32), points[None].astype(jnp.float32),
        idx[None], qi[None], k, include_self=include_self,
        need_dist=need_dist)
    return idx[0], dist[0]
