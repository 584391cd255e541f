"""DGCNN semantic segmentation.

TPU-native rebuild of the reference's ``dgcnn`` model (reference:
models/modules/dgcnn.py:44-134): three EdgeConv stages with dynamic feature-space kNN
(k=20), a 1024-d global max embedding, skip concat, and cls(17)/offset(3)/dist(1)
heads (offset/dist zero-initialized, returned but unused by the wrapper).

EdgeConv graph feature (dgcnn.py:13-41): per point, concat ``[x_j − x_i, x_i]`` over
its k feature-space neighbors. The kNN is exact, via the ops library (MXU pairwise
distance + top-k) instead of the reference's full [N, N] torch matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import MaskedBatchNorm, masked_max
from ..ops import index_points, knn_points


def edge_conv_feature(x: jnp.ndarray, k: int, mask=None,
                      sel_bf16: bool = False) -> jnp.ndarray:
    """[B, N, C] → [B, N, K, 2C] EdgeConv tensor ``[x_j − x_i, x_i]``."""
    idx, _ = knn_points(x, x, k, mask, mask, include_self=True,
                        need_dist=False, sel_bf16=sel_bf16)
    neigh = index_points(x, idx)  # [B, N, K, C]
    center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


class EdgeConvBlock(nn.Module):
    """Dense(bias=False)+BN+LeakyReLU(0.2) stacks applied to the graph tensor.
    Runs on flattened 2D ``[B·N·K, C]`` (TPU layout; small trailing dims tile
    terribly in 4D)."""

    features: tuple

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        b, n, kk, c = x.shape
        x = x.reshape(b * n * kk, c)
        flat_mask = None
        if mask is not None:
            flat_mask = jnp.broadcast_to(mask[..., None], (b, n, kk)).reshape(-1)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=False, name=f"dense_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, flat_mask, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return jnp.max(x.reshape(b, n, kk, -1), axis=2)  # max over K


class DGCNNSeg(nn.Module):
    num_classes: int = 17
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        x1 = EdgeConvBlock((64, 64), name="ec1")(
            edge_conv_feature(feat, self.k, mask, not train), mask, train)
        x2 = EdgeConvBlock((64, 64), name="ec2")(
            edge_conv_feature(x1, self.k, mask, not train), mask, train)
        x3 = EdgeConvBlock((64,), name="ec3")(
            edge_conv_feature(x2, self.k, mask, not train), mask, train)

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 192]
        x = nn.Dense(self.emb_dims, use_bias=False, name="emb")(x)
        x = MaskedBatchNorm(name="emb_bn")(x, mask, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        g = masked_max(x, mask, axis=1)  # [B, 1024]
        g = jnp.broadcast_to(g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1]))
        x = jnp.concatenate([g, x1, x2, x3], axis=-1)  # [B, N, 1216]

        x = nn.Dense(512, use_bias=False, name="head1")(x)
        x = nn.leaky_relu(MaskedBatchNorm(name="head1_bn")(x, mask, train), 0.2)
        x = nn.Dense(256, use_bias=False, name="head2")(x)
        x = nn.leaky_relu(MaskedBatchNorm(name="head2_bn")(x, mask, train), 0.2)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        cls = nn.Dense(self.num_classes, use_bias=False, name="cls")(x)
        offset = nn.Dense(3, use_bias=False, name="offset",
                          kernel_init=nn.initializers.zeros)(x)
        dist = nn.Dense(1, use_bias=False, name="dist",
                        kernel_init=nn.initializers.zeros)(x)
        return {"cls_pred": cls, "offset": offset, "dist": dist}
