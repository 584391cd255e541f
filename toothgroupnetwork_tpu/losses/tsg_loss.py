"""TSegNet losses.

TPU-native rebuild of the reference's ``tsg_loss.py``:
  * ``distance_loss`` (tsg_loss.py:4-13): smooth-L1 between the predicted per-l3-point
    distance and the true distance to the nearest GT centroid,
  * ``centroid_dist_loss`` (:15-36): bidirectional — moved-points→nearest-GT-centroid
    masked by predicted distance ≤ 0.2, plus GT-centroid→nearest-moved-point masked
    by that distance ≤ 0.2,
  * ``chamfer_distance_loss`` (:38-55): nearest/second-nearest ratio masked by
    nearest ≤ 0.2,
  * ``first_seg_loss`` (:63-75): the reference applies ``NLLLoss`` to SOFTMAX PROBS
    (not log-probs), so the per-point term is ``−p[gt]``; confidence-weighted as
    ``mean((−p·w)² + (1−w)²)`` with ``w = sigmoid(weight_1)`` — reproduced verbatim,
  * ``second_seg_loss`` (:92-104): BCE-with-logits weighted by ``(2 − w)``,
  * ``id_loss`` (:122-128): 17-way CE on the per-crop tooth id.

GT centroids arrive as fixed ``[B, 16, 3]`` + validity (invalid rows pushed to +inf
distance); crop terms are masked by crop validity (the reference has only real crops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e9


def _masked_min_dists(points, centroids, cent_valid, k=1):
    """Squared distances from each point to its k nearest VALID centroids."""
    d2 = jnp.sum((points[:, :, None, :] - centroids[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(cent_valid[:, None, :], d2, _BIG)
    neg, _ = jax.lax.top_k(-d2, k)
    return -neg  # [B, N, k] ascending


def smooth_l1(pred, target):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def distance_loss(pred_distance, sample_xyz, centroids, cent_valid, mask=None):
    """pred_distance [B,M,1], sample_xyz [B,M,3] (l3 points), centroids [B,16,3]."""
    min_d = jnp.sqrt(_masked_min_dists(sample_xyz, centroids, cent_valid)[..., 0])
    l = smooth_l1(pred_distance[..., 0], min_d)
    if mask is None:
        return jnp.mean(l)
    m = mask.astype(l.dtype)
    return jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)


def centroid_dist_loss(pred_offset, sample_xyz, pred_distance, centroids,
                       cent_valid, mask=None):
    moved = sample_xyz + pred_offset
    min_d = _masked_min_dists(moved, centroids, cent_valid)[..., 0]  # [B,M]
    sel = pred_distance[..., 0] <= 0.2
    if mask is not None:
        sel = sel & mask
    sf = sel.astype(min_d.dtype)
    loss = jnp.sum(min_d * sf) / jnp.maximum(jnp.sum(sf), 1.0)

    # centroid -> nearest moved point
    d2 = jnp.sum((centroids[:, :, None, :] - moved[:, None, :, :]) ** 2, -1)
    if mask is not None:
        d2 = jnp.where(mask[:, None, :], d2, _BIG)
    min_c = jnp.min(d2, axis=-1)                                    # [B,16]
    selc = (min_c <= 0.2) & cent_valid
    cf = selc.astype(min_c.dtype)
    loss += jnp.sum(min_c * cf) / jnp.maximum(jnp.sum(cf), 1.0)
    return loss


def chamfer_distance_loss(pred_offset, sample_xyz, centroids, cent_valid,
                          mask=None):
    moved = sample_xyz + pred_offset
    d2 = _masked_min_dists(moved, centroids, cent_valid, k=2)       # [B,M,2]
    ratio = d2[..., 0] / jnp.maximum(d2[..., 1], 1e-12)
    sel = d2[..., 0] <= 0.2
    if mask is not None:
        sel = sel & mask
    sf = sel.astype(ratio.dtype)
    return jnp.sum(ratio * sf) / jnp.maximum(jnp.sum(sf), 1.0)


def centroid_loss(pred_offset, sample_xyz, pred_distance, centroids, cent_valid,
                  mask=None):
    """(dist_loss, cent_loss, chamf_loss) triple (tsg_loss.py:57-61)."""
    return (
        distance_loss(pred_distance, sample_xyz, centroids, cent_valid, mask),
        centroid_dist_loss(pred_offset, sample_xyz, pred_distance, centroids,
                           cent_valid, mask),
        chamfer_distance_loss(pred_offset, sample_xyz, centroids, cent_valid,
                              mask),
    )


def first_seg_loss(pd_1, weight_1, gt_bin, crop_mask=None):
    """pd_1 [K,S,2] softmax probs; weight_1 [K,S,1]; gt_bin [K,S] in {0,1}."""
    p = jnp.take_along_axis(pd_1, gt_bin[..., None].astype(jnp.int32),
                            axis=-1)[..., 0]
    nll = -p  # NLL applied to probs (reference quirk, tsg_loss.py:70)
    w = jax.nn.sigmoid(weight_1[..., 0])
    term = (nll * w) ** 2 + (1.0 - w) ** 2
    if crop_mask is None:
        return jnp.mean(term)
    m = crop_mask.astype(term.dtype)
    return jnp.sum(term * m) / jnp.maximum(jnp.sum(m), 1.0)


def second_seg_loss(pd_2, weight_1, gt_bin, crop_mask=None):
    """pd_2 [K,S,1] logits."""
    z = pd_2[..., 0]
    y = gt_bin.astype(z.dtype)
    bce = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = jax.nn.sigmoid(weight_1[..., 0])
    term = (2.0 - w) * bce
    if crop_mask is None:
        return jnp.mean(term)
    m = crop_mask.astype(term.dtype)
    return jnp.sum(term * m) / jnp.maximum(jnp.sum(m), 1.0)


def id_loss(id_pred, gt_ids, crop_valid=None):
    """id_pred [K,17] logits; gt_ids [K] in 0..16."""
    logp = jax.nn.log_softmax(id_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_ids[:, None].astype(jnp.int32),
                              axis=-1)[:, 0]
    if crop_valid is None:
        return jnp.mean(ce)
    m = crop_valid.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
