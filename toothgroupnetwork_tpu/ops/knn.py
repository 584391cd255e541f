"""Exact k-nearest-neighbor query.

TPU-native equivalent of the reference's CUDA ``knnquery`` kernel
(reference: external_libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108; python
wrapper returns sqrt distances, external_libs/pointops/functions/pointops.py:43).

The jnp implementation tiles the query axis into static chunks; each chunk computes an
MXU-friendly ``[chunk, N]`` squared-distance block (matmul expansion) followed by
``lax.top_k`` — exact, deterministic, and fully fused by XLA. A Pallas kernel with a
running per-tile top-k lives in ``ops.pallas.knn_kernel``.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .distance import square_distance

_BIG = jnp.float32(1e10)


def _default_impl() -> str:
    return os.environ.get("TGN_TPU_KERNELS", "jnp")


def _use_approx_topk() -> bool:
    """Neighbor-candidate selection strategy. On TPU, ``lax.top_k`` lowers to a full
    bitonic sort over the candidate axis — measured 2.4 TB of memory traffic per
    24k-point backbone forward (~3 s). ``lax.approx_max_k`` uses the TPU PartialReduce
    unit (~4x faster, recall ≈0.976 at k=36); the k selected neighbors are then
    exactly re-scored and re-sorted, so distances/order are exact — only the
    candidate SET is approximate. Override with TGN_TPU_KNN=exact|approx."""
    mode = os.environ.get("TGN_TPU_KNN", "auto")
    if mode == "exact":
        return False
    if mode == "approx":
        return True
    # the axon platform is a tunneled TPU; default_backend() reports its own name
    return jax.default_backend() in ("tpu", "axon")


@partial(jax.jit, static_argnames=("k", "chunk", "impl"))
def knn_points(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    q_mask: jnp.ndarray | None = None,
    p_mask: jnp.ndarray | None = None,
    *,
    chunk: int = 2048,
    impl: str | None = None,
):
    """Exact kNN from ``query`` into ``points``.

    Args:
      query: ``[M, C]`` or ``[B, M, C]`` query points.
      points: ``[N, C]`` or ``[B, N, C]`` reference points.
      k: neighbors per query (static).
      q_mask / p_mask: optional validity masks. Invalid reference points are never
        returned as neighbors (distance pinned to 1e10); rows for invalid queries
        contain arbitrary (but in-range) indices.
      chunk: query-axis tile size for the distance blocks.

    Returns:
      ``(idx, dist)``: int32 ``[..., M, k]`` neighbor indices (ascending by distance)
      and float32 Euclidean distances (sqrt of squared, matching pointops.py:43).
    """
    if query.ndim == 3:
        b = query.shape[0]
        if b == 1:
            # vmap costs ~7x here (it forces a batched top_k lowering); unrolled
            # single-cloud path instead
            idx, dist = knn_points(
                query[0], points[0], k,
                None if q_mask is None else q_mask[0],
                None if p_mask is None else p_mask[0], chunk=chunk, impl=impl)
            return idx[None], dist[None]
        if q_mask is None:
            q_mask = jnp.ones(query.shape[:2], dtype=bool)
        if p_mask is None:
            p_mask = jnp.ones(points.shape[:2], dtype=bool)
        return jax.vmap(
            lambda q, p, qm, pm: knn_points(q, p, k, qm, pm, chunk=chunk, impl=impl)
        )(query, points, q_mask, p_mask)

    if impl is None:
        impl = _default_impl()
    if impl == "pallas":
        from .pallas.knn_kernel import knn_pallas

        return knn_pallas(query, points, k, q_mask, p_mask)

    m, _ = query.shape
    n = points.shape[0]
    if p_mask is None:
        p_valid = jnp.ones((n,), dtype=bool)
    else:
        p_valid = p_mask.astype(bool)
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)

    csize = min(chunk, m)
    n_chunks = -(-m // csize)
    pad = n_chunks * csize - m
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    qchunks = qpad.reshape(n_chunks, csize, -1)

    invalid_bias = jnp.where(p_valid, 0.0, _BIG)

    keff = min(k, n)

    approx = _use_approx_topk() and n >= 4096

    def one_chunk(qc):
        d2 = square_distance(qc, points) + invalid_bias[None, :]
        if approx:
            _, idx = jax.lax.approx_max_k(-d2, keff, recall_target=0.95)
        else:
            _, idx = jax.lax.top_k(-d2, keff)
        if keff < k:
            # Fewer points than neighbors requested: repeat the last neighbor.
            idx = jnp.concatenate([idx] + [idx[:, -1:]] * (k - keff), axis=-1)
        # Exact recompute of the selected distances by direct subtraction: the matmul
        # expansion can't represent self-distance as exactly 0, which would skew the
        # inverse-distance interpolation weights downstream. O(chunk*k*C), negligible.
        neigh = points[idx]  # [c, k, C]
        delta = qc[:, None, :] - neigh
        d2_exact = jnp.sum(delta * delta, axis=-1)
        # Re-sort the k selected by exact distance: the expansion's rounding can leave
        # borderline neighbors out of ascending order, and the contract (matching the
        # reference's heap-sort, knnquery_cuda_kernel.cu:21-48) is ascending.
        order = jnp.argsort(d2_exact, axis=-1)
        d2_exact = jnp.take_along_axis(d2_exact, order, axis=-1)
        idx = jnp.take_along_axis(idx, order, axis=-1)
        return idx.astype(jnp.int32), jnp.sqrt(d2_exact)

    idx, dist = jax.lax.map(one_chunk, qchunks)
    idx = idx.reshape(n_chunks * csize, k)[:m]
    dist = dist.reshape(n_chunks * csize, k)[:m]
    return idx, dist


def knn(query, points, k, q_mask=None, p_mask=None, **kw):
    """Alias of :func:`knn_points`."""
    return knn_points(query, points, k, q_mask, p_mask, **kw)
