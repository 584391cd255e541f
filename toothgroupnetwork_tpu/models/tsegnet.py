"""TSegNet: centroid-prediction + per-tooth crop segmentation.

TPU-native rebuild of the reference's tsegnet family (reference:
models/modules/tsegnet.py:10-99, tsg_centroid_module.py:5-66,
tsg_seg_module.py:5-100):

  * centroid module: PointNet++ MSG backbone (1024/512/256 centers, radii
    .025-.2), offset + distance heads on the l3 (256-point) level fed with
    ``concat[l3_points, l3_xyz]`` (515 ch), zero-initialized output layers,
  * crop proposals: DBSCAN(eps=.05, min_samples=3) over offset-moved l3 points with
    predicted distance < 0.3, ≤ 8 random centroids at train (tsegnet.py:57-71) —
    data-dependent and host-side, so it runs in the task's ``host_stage`` between
    the two jitted phases (the reference does this INSIDE its eager forward),
  * crops: 3072-point neighborhoods of the full cloud around each centroid with a
    distance density field ``exp(−4·dist_to_centroid)`` feature; crop features =
    ``[xyz(3), l0_features(32), ddf(1)]`` = 36 ch (tsegnet.py:24-33, 77-82),
  * seg module: two full PointNet++ towers — tower 1 (36 ch) → pd_1 (2-class
    softmax PROBS, matching tsg_seg_module.py:21-22) + confidence weight_1;
    tower 2 (38 ch = 36 + pd_1) → pd_2 (binary logit) + a global
    group-all SA → 17-way id head (zero-init final, tsg_seg_module.py:40-42).

TPU-dense: fixed crop slots (8 at train, 16 at inference) with validity masks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import MaskedBatchNorm
from ..nn.set_abstraction import (FeaturePropagation, SetAbstraction,
                                  SetAbstractionMsg)
from ..ops import index_points, knn_points

N_CROPS_TRAIN = 8


class PointNetPPBackbone(nn.Module):
    """The shared MSG backbone (scale=1) + FP decoder used by both tsegnet modules
    (identical layer dims to tsg_centroid_module.py:10-21 / tsg_seg_module.py:11-18).

    ``tiny=True`` swaps in a structurally-identical but minimal arch (3 MSG SA
    levels with 2 scales each + 3 FPs, tiny widths/center counts) for compile-
    bound contexts — the driver's virtual-8-device ``dryrun_multichip`` proves
    SHARDING semantics, which are arch-size-independent; the full graph (two seg
    towers + centroid backbone, each 6 MSG scale blocks, differentiated) was
    compile-bound >460 s on 8 virtual CPU devices (round-3 MULTICHIP rc=124).
    Production configs never set it.
    """

    tiny: bool = False

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        if self.tiny:
            sa_spec = [
                (32, [0.05, 0.1], [4, 8], [[8, 8], [8, 8]]),
                (16, [0.1, 0.2], [4, 8], [[8, 16], [8, 16]]),
                (8, [0.2, 0.4], [4, 8], [[16, 16], [16, 16]]),
            ]
            fp_spec = [[16, 16], [16, 16], [16, 8]]
        else:
            sa_spec = [
                (1024, [0.025, 0.05], [32, 64], [[32, 32], [32, 32]]),
                (512, [0.05, 0.1], [32, 64], [[64, 128], [64, 128]]),
                (256, [0.1, 0.2], [32, 64], [[196, 256], [196, 256]]),
            ]
            fp_spec = [[256, 256], [128, 128], [64, 32]]
        l0_xyz = feat[..., :3]
        l1_xyz, l1_points, m1 = SetAbstractionMsg(
            *sa_spec[0], name="sa1")(l0_xyz, feat, mask, train)
        l2_xyz, l2_points, m2 = SetAbstractionMsg(
            *sa_spec[1], name="sa2")(l1_xyz, l1_points, m1, train)
        l3_xyz, l3_points, m3 = SetAbstractionMsg(
            *sa_spec[2], name="sa3")(l2_xyz, l2_points, m2, train)
        l2_up = FeaturePropagation(fp_spec[0], name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, m2, m3, train)
        l1_up = FeaturePropagation(fp_spec[1], name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_up, m1, m2, train)
        l0_up = FeaturePropagation(fp_spec[2], name="fp1")(
            l0_xyz, l1_xyz, feat, l1_up, mask, m1, train)
        return {
            "l0_points": l0_up, "l3_points": l3_points,
            "l3_xyz": l3_xyz, "l3_mask": m3,
        }


class TsgCentroidModule(nn.Module):
    """Centroid prediction (tsg_centroid_module.py:5-48)."""

    tiny: bool = False

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        bb = PointNetPPBackbone(self.tiny, name="backbone")(feat, mask, train)
        h = jnp.concatenate([bb["l3_points"], bb["l3_xyz"]], axis=-1)  # 515 ch
        m3 = bb["l3_mask"]
        off = nn.relu(MaskedBatchNorm(name="offset_bn")(
            nn.Dense(256, name="offset_1")(h), m3, train))
        off = nn.Dense(3, name="offset_2", kernel_init=nn.initializers.zeros)(off)
        dist = nn.relu(MaskedBatchNorm(name="dist_bn")(
            nn.Dense(256, name="dist_1")(h), m3, train))
        dist = nn.Dense(1, name="dist_2", kernel_init=nn.initializers.zeros)(dist)
        return {
            "l0_points": bb["l0_points"],
            "l3_points": bb["l3_points"],
            "l3_xyz": bb["l3_xyz"],
            "l3_mask": m3,
            "offset_result": off,
            "dist_result": dist,
        }


class TsgSegModule(nn.Module):
    """Crop segmentation (tsg_seg_module.py:5-86). Input [K, 3072, 36]."""

    tiny: bool = False

    @nn.compact
    def __call__(self, crop_feat, crop_mask=None, train: bool = True):
        t1 = PointNetPPBackbone(self.tiny, name="tower1")(crop_feat, crop_mask, train)
        pd_1 = nn.softmax(nn.Dense(2, name="pd_mask_1")(t1["l0_points"]), axis=-1)
        weight_1 = nn.Dense(1, name="wt_mask_1")(t1["l0_points"])

        x2 = jnp.concatenate([crop_feat, pd_1], axis=-1)  # 38 ch
        t2 = PointNetPPBackbone(self.tiny, name="tower2")(x2, crop_mask, train)
        pd_2 = nn.Dense(1, name="pd_mask_2")(t2["l0_points"])

        # group-all SA on (l3_xyz, l3_points): 515 -> [256, 512] -> global max
        _, g, _ = SetAbstraction(0, 0.0, 0, [256, 512], group_all=True,
                                 name="flatten_sa")(
            t2["l3_xyz"], t2["l3_points"], t2["l3_mask"], train)
        g = g[:, 0, :]  # [K, 512]
        idh = nn.relu(nn.LayerNorm(name="id_ln")(nn.Dense(256, name="fc1")(g)))
        id_pred = nn.Dense(17, name="fc2", kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros)(idh)
        return pd_1, weight_1, pd_2, id_pred


def compute_ddf(crop_xyz: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Distance density field ``exp(−4·||x − c||)`` (tsegnet.py:24-33).
    crop_xyz [K, S, 3], centers [K, 3] → [K, S, 1]."""
    d = jnp.linalg.norm(crop_xyz - centers[:, None, :], axis=-1)
    return jnp.exp(-4.0 * d)[..., None]


class TSegNetModule(nn.Module):
    """Full tsegnet (tsegnet.py:10-99). ``center_points``/``center_valid`` are crop
    proposals injected from the host stage (DBSCAN over the centroid module's own
    predictions); at init/centroid-only mode they may be zeros."""

    crop_size: int = 3072
    run_seg_module: bool = True
    tiny_backbone: bool = False

    def setup(self):
        self.cent_module = TsgCentroidModule(self.tiny_backbone, name="cent_module")
        if self.run_seg_module:
            self.seg_module = TsgSegModule(self.tiny_backbone, name="seg_module")

    def __call__(self, feat, mask=None, train: bool = True,
                 center_points=None, center_valid=None):
        out = dict(self.cent_module(feat, mask, train))
        if not self.run_seg_module or center_points is None:
            return out

        b, k = center_points.shape[:2]
        crop_idx, _ = knn_points(center_points, feat[..., :3], self.crop_size,
                                 None, mask, need_dist=False,
                                 sel_bf16=not train)               # [B,K,S]
        crop_input = index_points(feat, crop_idx)                  # [B,K,S,6]
        crop_l0 = index_points(out["l0_points"], crop_idx)         # [B,K,S,32]
        flat = lambda x: x.reshape((b * k,) + x.shape[2:])
        crop_xyz = flat(crop_input)[..., :3]
        centers = flat(center_points[..., None, :])[:, 0, :]
        ddf = compute_ddf(crop_xyz, centers)
        crop_feat = jnp.concatenate([crop_xyz, flat(crop_l0), ddf], axis=-1)

        crop_mask = jnp.broadcast_to(center_valid[..., None],
                                     (b, k, self.crop_size)).reshape(b * k, -1)
        pd_1, weight_1, pd_2, id_pred = self.seg_module(crop_feat, crop_mask, train)
        out.update({
            "pd_1": pd_1, "weight_1": weight_1, "pd_2": pd_2, "id_pred": id_pred,
            "center_points": center_points, "center_valid": center_valid,
            "nn_crop_indexes": crop_idx, "cropped_feature_ls": crop_feat,
            "crop_mask": crop_mask,
        })
        return out

    def centroid_forward(self, feat, mask=None):
        return self.cent_module(feat, mask, False)

    def seg_forward(self, crop_feat, crop_mask=None):
        return self.seg_module(crop_feat, crop_mask, False)
