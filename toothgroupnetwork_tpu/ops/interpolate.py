"""k-NN feature interpolation (three_nn upsampling).

TPU-native equivalent of the reference's ``pointops.interpolation``
(reference: external_libs/pointops/functions/pointops.py:164-180: knnquery(k=3) ->
inverse-distance weights -> weighted gather) and the CUDA ``interpolation`` kernel pair
(external_libs/pointops/src/interpolation/interpolation_cuda_kernel.cu:5-33). The
backward here is whatever AD derives for the gather-einsum — a deterministic
scatter-add, replacing the reference's atomicAdd.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from .gather import index_points
from .knn import knn_points


@partial(jax.jit, static_argnames=("k",))
def knn_interpolate(
    target_xyz: jnp.ndarray,
    source_xyz: jnp.ndarray,
    source_feat: jnp.ndarray,
    k: int = 3,
    t_mask: jnp.ndarray | None = None,
    s_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Upsample features from ``source`` points onto ``target`` points.

    Weights are inverse-distance normalized, matching pointops.py:170-173:
    ``recip = 1/(dist + 1e-8); w = recip / sum(recip)``.

    Args:
      target_xyz: ``[..., M, 3]`` points to interpolate onto.
      source_xyz: ``[..., N, 3]`` points carrying features.
      source_feat: ``[..., N, C]`` features.

    Returns:
      ``[..., M, C]`` interpolated features.
    """
    idx, dist = knn_points(target_xyz, source_xyz, k, t_mask, s_mask)
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)  # [..., M, k]
    neigh = index_points(source_feat, idx)  # [..., M, k, C]
    # TPU layout: weighted sum as 2D multiply + MXU matmul-reduce over k (the
    # naive [..., M, k, C] einsum hits pathological tile padding for small k)
    c = source_feat.shape[-1]
    lead = neigh.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    prod = neigh.reshape(m * k, c) * weight.reshape(m * k, 1)
    reduce_m = jnp.tile(jnp.eye(c, dtype=prod.dtype), (k, 1))  # [k*C, C]
    out = jnp.matmul(prod.reshape(m, k * c), reduce_m,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (c,))


def three_nn_interpolate(target_xyz, source_xyz, source_feat,
                         t_mask=None, s_mask=None):
    """The classic PointNet++ three-NN upsampling (k=3)."""
    return knn_interpolate(target_xyz, source_xyz, source_feat, 3, t_mask, s_mask)
