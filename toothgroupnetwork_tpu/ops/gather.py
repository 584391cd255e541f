"""Index/gather ops.

TPU-native equivalent of the reference's ``index_points``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:44-61) and the CUDA
``grouping`` kernel (reference: external_libs/pointops/src/grouping/grouping_cuda_kernel.cu:5-25).
On TPU a gather is just ``jnp.take_along_axis``; its VJP is a deterministic
scatter-add (no atomics needed, unlike the reference's ``atomicAdd`` backward).
"""

from __future__ import annotations

import jax.numpy as jnp


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by index.

    Args:
      points: ``[B, N, C]`` (or ``[N, C]``) source array.
      idx: integer indices, ``[B, S]`` / ``[B, S, K]`` (or ``[S]`` / ``[S, K]``
        for unbatched input) into the N axis.

    Returns:
      ``points[..., idx, :]`` with shape ``idx.shape + (C,)``.
    """
    if points.ndim == 2:
        return points[idx]
    batch_dims = points.ndim - 2
    # Flatten idx trailing dims, gather along axis -2, restore.
    flat_idx = idx.reshape(idx.shape[:batch_dims] + (-1,))
    expanded = jnp.broadcast_to(
        flat_idx[..., None],
        flat_idx.shape + (points.shape[-1],),
    )
    out = jnp.take_along_axis(points, expanded, axis=-2)
    return out.reshape(idx.shape + (points.shape[-1],))


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighborhood gather: ``[B, N, C]`` + ``[B, S, K]`` -> ``[B, S, K, C]``.

    Same contract as the reference's CUDA grouping op
    (external_libs/pointops/functions/pointops.py:48-76) modulo the dense-batch layout.
    """
    return index_points(points, idx)
