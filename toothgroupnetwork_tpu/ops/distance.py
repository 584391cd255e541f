"""Pairwise squared-distance ops.

TPU-native equivalent of the reference's ``square_distance``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:20-41), which computes
``||src - dst||^2`` via the matmul expansion — exactly the right shape for the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance.

    Args:
      src: ``[..., M, C]`` points.
      dst: ``[..., N, C]`` points.

    Returns:
      ``[..., M, N]`` squared distances, clamped to >= 0 (the matmul expansion can go
      slightly negative in floating point).
    """
    # ||s||^2 - 2 s.d + ||d||^2 ; the cross term rides the MXU. Full f32 precision:
    # these distances drive neighbor *selection* (kNN/FPS/ball query), where bf16
    # truncation flips argmin results.
    cross = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    out = s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2)
    return jnp.maximum(out, 0.0)


def pairwise_sqdist(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Alias of :func:`square_distance` (kept for call-site clarity)."""
    return square_distance(src, dst)
