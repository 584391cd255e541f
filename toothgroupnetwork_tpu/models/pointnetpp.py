"""PointNet++ MSG semantic segmentation.

TPU-native rebuild of the reference's ``pointnetpp`` model
(reference: models/modules/pointnet_pp.py:6-92): 3 multi-scale-grouping SA stages
(1024/512/256 centers, radii 0.025-0.2) at scale=4, 3 FP upsampling stages, and
cls(17) / offset(3) / dist(1) heads with zero-initialized offset/dist output layers
(pointnet_pp.py:35-36). The wrapper exposes only ``cls_pred`` (pointnet_pp.py:73-92);
offset/dist are returned for the tsegnet centroid module which shares this backbone.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import MaskedBatchNorm
from ..nn.set_abstraction import FeaturePropagation, SetAbstractionMsg


class PointNetPPSeg(nn.Module):
    num_classes: int = 17
    scale: int = 4

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        """feat [B,N,6] xyz+normal. Returns cls_pred [B,N,17] logits, offset [B,N,3],
        dist [B,N,1], plus the l0/l3 features the tsegnet centroid path consumes."""
        s = self.scale
        l0_xyz = feat[..., :3]
        l0_points = feat  # full 6-ch features, matching pointnet_pp.py:47-49

        l1_xyz, l1_points, m1 = SetAbstractionMsg(
            1024, [0.025, 0.05], [32, 64],
            [[32 * s, 32 * s], [32 * s, 32 * s]], name="sa1",
        )(l0_xyz, l0_points, mask, train)
        l2_xyz, l2_points, m2 = SetAbstractionMsg(
            512, [0.05, 0.1], [32, 64],
            [[64 * s, 128 * s], [64 * s, 128 * s]], name="sa2",
        )(l1_xyz, l1_points, m1, train)
        l3_xyz, l3_points, m3 = SetAbstractionMsg(
            256, [0.1, 0.2], [32, 64],
            [[196 * s, 256 * s], [196 * s, 256 * s]], name="sa3",
        )(l2_xyz, l2_points, m2, train)

        l2_points = FeaturePropagation([256 * s, 256 * s], name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, m2, m3, train)
        l1_points = FeaturePropagation([128 * s, 128 * s], name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, m1, m2, train)
        l0_points = FeaturePropagation([64 * s, 32 * s], name="fp1")(
            l0_xyz, l1_xyz, feat, l1_points, mask, m1, train)

        offset = nn.relu(MaskedBatchNorm(name="offset_bn")(
            nn.Dense(16, name="offset_1")(l0_points), mask, train))
        offset = nn.Dense(3, name="offset_2",
                          kernel_init=nn.initializers.zeros)(offset)
        dist = nn.relu(MaskedBatchNorm(name="dist_bn")(
            nn.Dense(16, name="dist_1")(l0_points), mask, train))
        dist = nn.Dense(1, name="dist_2", kernel_init=nn.initializers.zeros)(dist)

        cls = nn.relu(MaskedBatchNorm(name="cls_bn")(
            nn.Dense(self.num_classes, name="cls_1")(l0_points), mask, train))
        cls = nn.Dense(self.num_classes, name="cls_2")(cls)

        return {
            "cls_pred": cls,
            "offset": offset,
            "dist": dist,
            "l0_points": l0_points,
            "l3_points": l3_points,
            "l3_xyz": l3_xyz,
            "l3_mask": m3,
        }
