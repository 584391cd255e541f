"""FPS + grouping composites used by the PointNet++ set-abstraction layers.

TPU-native equivalent of the reference's ``sample_and_group`` /
``sample_and_group_all`` (reference: external_libs/pointnet2_utils/pointnet2_utils.py:147-195).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ball_query import ball_query
from .fps import farthest_point_sample
from .gather import index_points


@partial(jax.jit, static_argnames=("npoint", "nsample"))
def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
):
    """FPS-downsample + ball-query group + recenter.

    Args:
      npoint: number of FPS centers (static).
      radius / nsample: ball-query parameters.
      xyz: ``[B, N, 3]`` coordinates.
      points: optional ``[B, N, D]`` features to group alongside xyz.
      mask: optional ``[B, N]`` validity mask.

    Returns:
      ``(new_xyz [B, npoint, 3], new_points [B, npoint, nsample, 3(+D)],
        fps_idx [B, npoint], group_idx [B, npoint, nsample])``
    """
    fps_idx = farthest_point_sample(xyz, npoint, mask)
    new_xyz = index_points(xyz, fps_idx)
    idx = ball_query(radius, nsample, xyz, new_xyz, mask)
    grouped_xyz = index_points(xyz, idx)  # [B, S, K, 3]
    grouped_norm = grouped_xyz - new_xyz[..., None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    return new_xyz, new_points, fps_idx, idx


@jax.jit
def sample_and_group_all(xyz: jnp.ndarray, points: jnp.ndarray | None = None,
                         mask: jnp.ndarray | None = None):
    """Single global group (pointnet2_utils.py:178-195).

    Returns ``(new_xyz [B, 1, 3] zeros, new_points [B, 1, N, 3(+D)])``. When a mask is
    given, padded points' features are zeroed so downstream max-pools with a masked
    bias still behave (callers should also apply the mask at the pool).
    """
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), dtype=xyz.dtype)
    grouped = xyz[:, None, :, :]
    if points is not None:
        grouped = jnp.concatenate([grouped, points[:, None, :, :]], axis=-1)
    if mask is not None:
        grouped = jnp.where(mask[:, None, :, None], grouped, 0.0)
    return new_xyz, grouped
