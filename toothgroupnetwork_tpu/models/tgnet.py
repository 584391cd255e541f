"""tgnet: the two-stage challenge-winning grouping network (FPS stage).

TPU-native rebuild of the reference's ``GroupingNetworkModule``
(reference: models/modules/grouping_network_module.py:7-101) and the
``FpsGroupingNetworkModel`` wrapper (models/fps_grouping_network_model.py:6-65):

  * stage 1: point-transformer backbone over the full 24k cloud with k = 9+1
    half-arch semantic classes (left/right merged: label −8 for classes ≥9,
    grouping_network_module.py:26-27), offset head, CBL,
  * train-time cropping: per-tooth GT centroids (mean xyz of each labeled tooth,
    grouping_network_module.py:47-56) → ``crop_size``-point nearest-neighbor crops →
    per-crop xyz centering (ops_utils.py:146-218, 164-169),
  * stage 2: the same backbone (k=2 FG/BG) over the crops with clamped labels
    (≥0 → 0, so after the +1 loss shift: 0 = gingiva, 1 = tooth).

TPU-dense design: a FIXED 16 crop slots (one per tooth class) with a crop-validity
mask replaces the reference's ragged #teeth-sized crop batch; the crop kNN runs
on-device (the reference round-trips to a CPU sklearn KDTree mid-forward,
SURVEY.md §3.2). Missing teeth get far-away sentinel centroids and are masked out of
every loss and BN statistic.

At inference the two stages run separately (``stage1`` / ``stage2`` methods): the
instance clustering between them is host-side postprocessing (pipelines/tgn.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import index_points, knn_points
from .point_transformer.backbone import PointTransformerSeg

N_TEETH = 16
_FAR = 1e3


def half_arch_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Merge left/right arch classes: 9..15 → 1..7 (−1 and 0..8 unchanged)."""
    return jnp.where(labels >= 9, labels - 8, labels)


def binary_crop_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Clamp crop labels to {−1 gingiva, 0 any-tooth} (fps_grouping_network_model.py:11)."""
    return jnp.where(labels >= 0, 0, labels)


def gt_tooth_centroids(xyz: jnp.ndarray, labels: jnp.ndarray,
                       mask: jnp.ndarray | None = None):
    """Per-tooth-class centroids from GT labels.

    Returns (centroids [B, 16, 3], valid [B, 16]); missing teeth get a far-away
    sentinel so their crops gather points that are then masked out.
    """
    classes = jnp.arange(N_TEETH)
    tooth = labels[:, None, :] == classes[None, :, None]          # [B,16,N]
    if mask is not None:
        tooth = tooth & mask[:, None, :]
    tf = tooth.astype(jnp.float32)
    counts = jnp.sum(tf, axis=-1)
    cent = jnp.einsum("btn,bnc->btc", tf, xyz.astype(jnp.float32))
    cent = cent / jnp.maximum(counts, 1.0)[..., None]
    valid = counts > 0
    cent = jnp.where(valid[..., None], cent, _FAR)
    return cent, valid


def make_crops(feat: jnp.ndarray, centroids: jnp.ndarray, crop_valid: jnp.ndarray,
               crop_size: int, mask: jnp.ndarray | None = None,
               extra: jnp.ndarray | None = None, sel_bf16: bool = False):
    """Nearest-``crop_size`` crops around each centroid, xyz recentered per crop.

    Args:
      feat: [B, N, C] features (xyz first 3 channels).
      centroids: [B, K, 3]; crop_valid: [B, K].
      extra: optional [B, N] per-point payload to crop alongside (e.g. labels).

    Returns (crop_feat [B*K, crop_size, C], crop_mask [B*K, crop_size],
             crop_idx [B, K, crop_size], cropped_extra [B*K, crop_size] or None).
    """
    b, n, c = feat.shape
    k = centroids.shape[1]
    idx, _ = knn_points(centroids, feat[..., :3], crop_size,
                        None, mask, need_dist=False, sel_bf16=sel_bf16)  # [B,K,S]
    crop = index_points(feat, idx)                                 # [B,K,S,C]
    xyz = crop[..., :3]
    xyz = xyz - jnp.mean(xyz, axis=2, keepdims=True)               # per-crop center
    crop = jnp.concatenate([xyz, crop[..., 3:]], axis=-1)
    crop = crop.reshape(b * k, crop_size, c)
    crop_mask = jnp.broadcast_to(crop_valid[..., None],
                                 (b, k, crop_size)).reshape(b * k, crop_size)
    cropped_extra = None
    if extra is not None:
        cropped_extra = index_points(extra[..., None].astype(jnp.float32), idx)
        cropped_extra = cropped_extra[..., 0].reshape(b * k, crop_size)
    return crop, crop_mask, idx, cropped_extra


class TGNet(nn.Module):
    """Two cascaded backbones (grouping_network_module.py:13-14)."""

    crop_size: int = 3072
    c: int = 6
    planes: tuple = (32, 64, 128, 256, 512)
    stride: tuple = (1, 4, 4, 4, 4)
    nsample: tuple = (36, 24, 24, 24, 24)
    blocks: tuple = (2, 3, 4, 6, 3)
    block_num: int = 5
    dtype: jnp.dtype = jnp.float32
    # super-row candidate gathers on the full-res stage-1 backbone (eval-mode;
    # requires a spatially sorted input cloud — see PointTransformerSeg)
    cell_attention: bool = False

    def setup(self):
        kw = dict(c=self.c, planes=self.planes, stride=self.stride,
                  nsample=self.nsample, blocks=self.blocks,
                  block_num=self.block_num, dtype=self.dtype,
                  cell_attention=self.cell_attention)
        self.first_ins_cent_model = PointTransformerSeg(k=10, name="first", **kw)
        # the crop stage runs batched (B*K crops) — cell path self-disables
        # there (B != 1), so sharing the flag is harmless. Crop masks are
        # whole-crop validity planes (make_crops broadcasts crop_valid), so
        # the stage-0 self-kNN may window under them (mask_per_cloud).
        self.second_ins_cent_model = PointTransformerSeg(
            k=2, name="second", mask_per_cloud=True, **kw)

    def __call__(self, feat, mask=None, train: bool = True, labels=None):
        """Full train-path forward: stage 1 + GT-centroid crops + stage 2.

        ``labels``: [B, N] GT labels in −1..15 (required; train-time cropping uses
        GT centroids, grouping_network_module.py:47-56).
        """
        out1 = self.first_ins_cent_model(feat, mask, train)
        centroids, crop_valid = gt_tooth_centroids(feat[..., :3], labels, mask)
        crop_feat, crop_mask, crop_idx, crop_labels = make_crops(
            feat, centroids, crop_valid, self.crop_size, mask, extra=labels,
            sel_bf16=not train)
        out2 = self.second_ins_cent_model(crop_feat, crop_mask, train)
        return {
            "sem_1": out1["sem_1"],
            "offset_1": out1["offset_1"],
            "cbl_stages_1": out1["cbl_stages"],
            "first_features": out1["embed"],
            "sem_2": out2["sem_1"],
            "offset_2": out2["offset_1"],
            "cbl_stages_2": out2["cbl_stages"],
            "cluster_gt_seg_label": (crop_labels.astype(jnp.int32)
                                     if crop_labels is not None else None),
            "crop_valid": crop_valid,
            "crop_mask": crop_mask,
            "nn_crop_indexes": crop_idx,
            "cropped_feature_ls": crop_feat,
            "cls_pred": out1["sem_1"],
        }

    def stage1(self, feat, mask=None):
        """Inference stage 1 (no labels)."""
        return self.first_ins_cent_model(feat, mask, False)

    def stage2(self, crop_feat, crop_mask=None):
        """Inference stage 2 over externally built crops."""
        return self.second_ins_cent_model(crop_feat, crop_mask, False)
