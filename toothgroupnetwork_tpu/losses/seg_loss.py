"""Semantic segmentation losses.

TPU-native equivalent of the reference's ``tooth_class_loss`` (reference:
models/tgn_loss.py:355-372: labels shifted +1 so gingiva(−1)→0, then CrossEntropy,
optionally label-smoothed via tgn_loss.py:337-353) and
``feature_transform_reguliarzer`` (external_libs/pointnet2_utils/pointnet_utils.py:137-143).

Mask-aware: averaged over valid points only (the reference has no padding concept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tooth_class_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mask: jnp.ndarray | None = None,
    weight: jnp.ndarray | None = None,
    label_smoothing: float | None = None,
) -> jnp.ndarray:
    """Cross-entropy with the reference's +1 label shift.

    Args:
      logits: ``[..., N, num_classes]``.
      labels: ``[..., N]`` int in −1..num_classes−2 (−1 = gingiva).
      mask: optional ``[..., N]`` validity mask.
      weight: optional per-class weights ``[num_classes]`` (CE ``weight=`` contract:
        weighted mean = Σ w_y·ce / Σ w_y).
      label_smoothing: optional smoothing factor (LabelSmoothingLoss contract:
        off-target mass = smoothing/(num_classes−1), on-target = 1−smoothing; plain
        mean, not weight-normalized).
    """
    labels = labels.astype(jnp.int32) + 1
    labels = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)

    if label_smoothing is not None:
        conf = 1.0 - label_smoothing
        off = label_smoothing / (num_classes - 1)
        onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
        true_dist = onehot * (conf - off) + off
        ce = -jnp.sum(true_dist * logp, axis=-1)
        if mask is None:
            return jnp.mean(ce)
        m = mask.astype(ce.dtype)
        return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight, dtype=ce.dtype)[labels]
    else:
        w = jnp.ones_like(ce)
    if mask is not None:
        w = w * mask.astype(ce.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """``mean_b ||I − T Tᵀ||_F`` (pointnet_utils.py:137-143)."""
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    diff = jnp.matmul(trans, jnp.swapaxes(trans, -1, -2),
                      precision=jax.lax.Precision.HIGHEST) - eye
    return jnp.mean(jnp.sqrt(jnp.sum(diff * diff, axis=(-2, -1)) + 1e-12))
