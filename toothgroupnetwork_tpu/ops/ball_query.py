"""Radius ball query.

TPU-native equivalent of the reference's ``query_ball_point``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:120-144).

Faithful semantics: for each query, take the ``k`` *lowest-index* points whose squared
distance is within ``radius^2`` (the reference sorts indices, not distances), filling
missing slots with the first in-ball point. Deviation (documented): when a query has NO
point in the ball the reference would propagate index ``N`` (and crash or mis-gather
downstream, guarded by a try/except at pointnet2_utils.py:130-142); we fall back to the
nearest point instead, which is strictly safer and changes nothing on real data.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import square_distance

_BIG = jnp.float32(1e10)


@partial(jax.jit, static_argnames=("k", "chunk"))
def ball_query(
    radius: float,
    k: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    p_mask: jnp.ndarray | None = None,
    *,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Radius neighborhood query.

    Args:
      radius: ball radius.
      k: max points per ball (static).
      xyz: ``[N, 3]`` or ``[B, N, 3]`` reference points.
      new_xyz: ``[S, 3]`` or ``[B, S, 3]`` query centers.
      p_mask: optional validity mask over ``xyz``.

    Returns:
      int32 ``[..., S, k]`` indices into the N axis.
    """
    if xyz.ndim == 3:
        if p_mask is None:
            p_mask = jnp.ones(xyz.shape[:2], dtype=bool)
        return jax.vmap(lambda p, q, m: ball_query(radius, k, p, q, m, chunk=chunk))(
            xyz, new_xyz, p_mask
        )

    n = xyz.shape[0]
    s = new_xyz.shape[0]
    if p_mask is None:
        p_valid = jnp.ones((n,), dtype=bool)
    else:
        p_valid = p_mask.astype(bool)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    csize = min(chunk, s)
    n_chunks = -(-s // csize)
    pad = n_chunks * csize - s
    qpad = jnp.pad(new_xyz, ((0, pad), (0, 0)))
    qchunks = qpad.reshape(n_chunks, csize, 3)

    iota = jnp.arange(n, dtype=jnp.int32)
    invalid_bias = jnp.where(p_valid, 0.0, _BIG)
    r2 = jnp.float32(radius) ** 2

    keff = min(k, n)

    def one_chunk(qc):
        d2 = square_distance(qc, xyz) + invalid_bias[None, :]  # [c, N]
        in_ball = d2 <= r2
        # k lowest indices within the ball: top_k on (n - idx) masked.
        score = jnp.where(in_ball, (n - iota).astype(jnp.float32)[None, :], -1.0)
        top, idx = jax.lax.top_k(score, keff)
        if keff < k:
            top = jnp.concatenate(
                [top, jnp.full((top.shape[0], k - keff), -1.0, top.dtype)], -1)
            idx = jnp.concatenate(
                [idx, jnp.zeros((idx.shape[0], k - keff), idx.dtype)], -1)
        found = top > 0.0
        first = idx[:, :1]
        idx = jnp.where(found, idx, first)
        # Fallback when the ball is empty: nearest valid point.
        nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)[:, None]
        any_found = found[:, :1]
        return jnp.where(any_found, idx, nearest).astype(jnp.int32)

    idx = jax.lax.map(one_chunk, qchunks)
    return idx.reshape(n_chunks * csize, k)[:s]
