"""tgnet offset & chamfer losses.

TPU-native rebuild of the reference's ``batch_center_offset_loss``
(reference: models/tgn_loss.py:6-61) and ``batch_chamfer_distance_loss``
(models/tgn_loss.py:263-302). The reference loops over batch × 16 tooth classes with
boolean indexing; here both are masked-dense one-shot computations (static shapes):

  * per-tooth masks ``[B, 16, N]`` from one-hot labels,
  * teeth with <5 points are skipped (tgn_loss.py:30-31) via a validity mask,
  * offset loss: mean squared distance of offset-moved points to their tooth's
    centroid, averaged per tooth then over valid (batch, tooth) pairs,
  * direction loss: ``(<offset_dir, to_centroid_dir> − 1)²`` over points with
    ``||offset|| > 2e-4`` (tgn_loss.py:50-58),
  * chamfer loss: for foreground points, ratio of distance-to-nearest vs
    second-nearest valid tooth centroid, averaged per cloud then over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_N_TEETH = 16
_BIG = 1e9


def _tooth_masks(gt_label: jnp.ndarray, point_mask: jnp.ndarray | None):
    """[B, N] labels → per-tooth masks [B, 16, N], counts [B, 16], centroid validity
    (count >= 5)."""
    classes = jnp.arange(_N_TEETH)
    tooth = (gt_label[:, None, :] == classes[None, :, None])
    if point_mask is not None:
        tooth = tooth & point_mask[:, None, :]
    counts = jnp.sum(tooth, axis=-1)
    return tooth.astype(jnp.float32), counts, counts >= 5


def _tooth_centroids(xyz, tooth_f, counts):
    """Masked per-tooth centroid [B, 16, 3]."""
    sums = jnp.einsum("btn,bnc->btc", tooth_f, xyz)
    return sums / jnp.maximum(counts, 1.0)[..., None]


def batch_center_offset_loss(
    pred_offset: jnp.ndarray,
    xyz: jnp.ndarray,
    gt_label: jnp.ndarray,
    point_mask: jnp.ndarray | None = None,
):
    """Returns (centroid_loss, dir_loss). Args are channel-last: offset/xyz
    ``[B, N, 3]``, labels ``[B, N]`` in −1..15."""
    xyz = xyz.astype(jnp.float32)
    pred_offset = pred_offset.astype(jnp.float32)
    tooth_f, counts, valid = _tooth_masks(gt_label, point_mask)
    cent = _tooth_centroids(xyz, tooth_f, counts.astype(jnp.float32))  # [B,16,3]

    moved = xyz + pred_offset                                          # [B,N,3]
    d2 = jnp.sum((moved[:, None, :, :] - cent[:, :, None, :]) ** 2, -1)  # [B,16,N]
    per_tooth = jnp.sum(d2 * tooth_f, -1) / jnp.maximum(counts, 1.0)     # [B,16]
    vf = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(vf), 1.0)
    centroid_loss = jnp.sum(per_tooth * vf) / n_valid

    # direction term
    off_norm = jnp.linalg.norm(pred_offset, axis=-1)                   # [B,N]
    off_dir = pred_offset / jnp.maximum(off_norm, 1e-12)[..., None]
    to_cent = cent[:, :, None, :] - xyz[:, None, :, :]                 # [B,16,N,3]
    to_cent_dir = to_cent / jnp.maximum(
        jnp.linalg.norm(to_cent, axis=-1, keepdims=True), 1e-12)
    dot = jnp.einsum("bnc,btnc->btn", off_dir, to_cent_dir)
    sq = (dot - 1.0) ** 2                                              # [B,16,N]
    moving = (off_norm > 2e-4)[:, None, :]                             # [B,1,N]
    sel = tooth_f * moving * vf[..., None]
    n_sel = jnp.sum(sel, axis=-1)                                      # [B,16]
    per_tooth_dir = jnp.sum(sq * sel, -1) / jnp.maximum(n_sel, 1.0)
    has_dir = (n_sel > 0).astype(jnp.float32)
    dir_loss = jnp.sum(per_tooth_dir * has_dir) / jnp.maximum(jnp.sum(has_dir), 1.0)
    return centroid_loss, dir_loss


def batch_chamfer_distance_loss(
    pred_offset: jnp.ndarray,
    xyz: jnp.ndarray,
    gt_label: jnp.ndarray,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Nearest / second-nearest centroid distance ratio over foreground points."""
    xyz = xyz.astype(jnp.float32)
    pred_offset = pred_offset.astype(jnp.float32)
    tooth_f, counts, valid = _tooth_masks(gt_label, point_mask)
    cent = _tooth_centroids(xyz, tooth_f, counts.astype(jnp.float32))

    moved = xyz + pred_offset
    d2 = jnp.sum((moved[:, :, None, :] - cent[:, None, :, :]) ** 2, -1)  # [B,N,16]
    d2 = jnp.where(valid[:, None, :], d2, _BIG)
    neg_top2, _ = jax.lax.top_k(-d2, 2)
    d0, d1 = -neg_top2[..., 0], -neg_top2[..., 1]
    ratio = d0 / jnp.maximum(d1, 1e-12)

    fg = gt_label != -1
    if point_mask is not None:
        fg = fg & point_mask
    fgf = fg.astype(jnp.float32)
    per_cloud = jnp.sum(ratio * fgf, -1) / jnp.maximum(jnp.sum(fgf, -1), 1.0)
    return jnp.mean(per_cloud)
