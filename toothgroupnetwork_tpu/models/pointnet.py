"""PointNet semantic segmentation (the minimum end-to-end model family).

TPU-native rebuild of the reference's ``pointnet`` model: ``PointNetEncoder`` with
input/feature spatial transformers (reference:
external_libs/pointnet2_utils/pointnet_utils.py:10-134) and the 4-layer seg head at
scale=2 with 17 output classes (reference: models/modules/pointnet.py:9-35).

Deviations (documented):
  * channel-last ``[B, N, C]`` layout; ``Conv1d(k=1)`` → Dense,
  * the head emits raw LOGITS; the reference emits log_softmax and then applies
    CrossEntropyLoss on top of it (a double-log-softmax quirk,
    models/modules/pointnet.py:33 + tgn_loss.py:366) — monotone-equivalent, we use
    standard CE on logits,
  * all pools/statistics are mask-aware for padded clouds.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import MaskedBatchNorm, PointMLP, masked_max


class SpatialTransformer(nn.Module):
    """STN: per-point MLP → global max-pool → FC head → ``k×k`` transform = I + Δ.

    Covers both STN3d (k=3, pointnet_utils.py:10-45) and STNkd (pointnet_utils.py:48-85).
    The FC stack uses LayerNorm, matching the reference's bn4/bn5 (= nn.LayerNorm —
    the reference swapped them in for batch-1 stability).
    """

    k: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        b = x.shape[0]
        h = PointMLP([64, 128, 1024])(x, mask, train)
        g = masked_max(h, mask, axis=1)  # [B, 1024]
        g = nn.relu(nn.LayerNorm()(nn.Dense(512)(g)))
        g = nn.relu(nn.LayerNorm()(nn.Dense(256)(g)))
        delta = nn.Dense(self.k * self.k,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(g)
        iden = jnp.eye(self.k, dtype=delta.dtype).reshape(1, self.k * self.k)
        return (delta + iden).reshape(b, self.k, self.k)


class PointNetEncoder(nn.Module):
    """PointNetEncoder (pointnet_utils.py:88-134): STN on xyz, shared MLPs, optional
    feature STN, global max-pool; seg mode concatenates the broadcast global feature
    with the per-point features."""

    global_feat: bool = True
    feature_transform: bool = False
    scale: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        s = self.scale
        trans = SpatialTransformer(3, name="stn")(x, mask, train)
        xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
        if x.shape[-1] > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz
        x = PointMLP([64 * s], name="mlp1")(x, mask, train)

        trans_feat = None
        if self.feature_transform:
            trans_feat = SpatialTransformer(64 * s, name="fstn")(x, mask, train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)

        point_feat = x
        x = PointMLP([128 * s], name="mlp2")(x, mask, train)
        x = PointMLP([1024 * s], name="mlp3", last_activation=False)(x, mask, train)
        g = masked_max(x, mask, axis=1)  # [B, 1024*s]
        if self.global_feat:
            return g, trans, trans_feat
        n = point_feat.shape[1]
        g_b = jnp.broadcast_to(g[:, None, :], (g.shape[0], n, g.shape[-1]))
        return jnp.concatenate([g_b, point_feat], axis=-1), trans, trans_feat


class PointNetSeg(nn.Module):
    """17-way semantic segmentation head (models/modules/pointnet.py:9-35)."""

    num_classes: int = 17
    scale: int = 2

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        """feat: ``[B, N, 6]`` xyz+normals. Returns dict with ``cls_pred`` logits
        ``[B, N, num_classes]`` and ``trans_feat`` for the optional regularizer."""
        s = self.scale
        x, _, trans_feat = PointNetEncoder(
            global_feat=False, feature_transform=True, scale=s, name="feat",
        )(feat, mask, train)
        x = PointMLP([512 * s, 256 * s, 128 * s], name="head")(x, mask, train)
        logits = nn.Dense(self.num_classes, name="cls")(x)
        return {"cls_pred": logits, "trans_feat": trans_feat}
