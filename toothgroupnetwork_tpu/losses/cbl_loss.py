"""Contrastive Boundary Learning loss.

TPU-native rebuild of the reference's ContrastHead (reference:
models/modules/cbl_point_transformer/heads.py:63-253) with the default.yaml config
(contrast: stage Ua, softnn, ftype latent, sample label, pos cnt, dist l2,
temperature 1, weight "w.1" → 0.1).

Per up-stage:
  * subscene labels: mean of one-hot full-res labels over each stage point's
    ``kr``-NN in the FULL-RES cloud, where ``kr = prod(stride[:i])``
    (basic_operators.py:16-50); stage 0 uses the one-hot labels directly,
  * neighborhood = the stage's attention kNN minus the self point
    (heads.py:199-203),
  * posmask = argmax-label equality (heads.py:145-149),
  * rows kept only when they have BOTH positives and negatives (heads.py:226-228),
  * l2 feature distance + softnn contrast
    ``−log(Σ exp(−d)·pos / Σ exp(−d))`` with max-subtraction, temperature 1
    (heads.py:116-119, 151-165),
  * mean over kept rows × 0.1 (heads.py:243-245).

Masked-dense formulation: boolean ``point_mask`` replaces the reference's boolean
indexing (shapes stay static for XLA).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import index_points, knn_points

_EPS = 1e-12


def cbl_loss_per_stage(
    cbl_stages: list[dict],
    target: jnp.ndarray,
    num_classes: int,
    stride,
    temperature: float = 1.0,
    weight: float = 0.1,
) -> list[jnp.ndarray]:
    """Returns one scalar loss per up stage.

    Args:
      cbl_stages: per-stage dicts {p [B,Ni,3], latent [B,Ni,C], mask [B,Ni],
        knn_idx [B,Ni,K]} from the backbone (stage 0 = full resolution).
      target: [B, N] int labels in −1..num_classes−2 (shifted +1 internally,
        matching cbl_point_transformer_module.py:202).
      stride: per-stage stride list (kr = prod(stride[:i])).
    """
    p0 = cbl_stages[0]["p"]
    m0 = cbl_stages[0]["mask"]
    onehot0 = jax.nn.one_hot(target.astype(jnp.int32) + 1, num_classes,
                             dtype=jnp.float32)

    losses = []
    for i, st in enumerate(cbl_stages):
        if i == 0:
            labels = onehot0
        else:
            kr = int(math.prod(stride[:i]))
            idx, _ = knn_points(st["p"], p0, kr, st["mask"], m0, need_dist=False)
            labels = jnp.mean(index_points(onehot0, idx), axis=2)  # [B,Ni,ncls]

        nb_idx = st["knn_idx"][..., 1:]  # exclude self-loop
        nb_labels = index_points(labels, nb_idx)               # [B,Ni,K-1,ncls]
        center_lab = jnp.argmax(labels, axis=-1)
        nb_lab = jnp.argmax(nb_labels, axis=-1)
        posmask = (center_lab[..., None] == nb_lab)            # [B,Ni,K-1]

        k1 = posmask.shape[-1]
        pos_cnt = jnp.sum(posmask, axis=-1)
        point_mask = (pos_cnt > 0) & (pos_cnt < k1)
        if st["mask"] is not None:
            point_mask = point_mask & st["mask"]

        feats = st["latent"]
        nb_feats = index_points(feats, nb_idx)                 # [B,Ni,K-1,C]
        diff = feats[..., None, :] - nb_feats
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS)  # [B,Ni,K-1]

        logits = -dist
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        if temperature is not None:
            logits = logits / temperature
        ex = jnp.exp(logits)
        pos = jnp.sum(ex * posmask, axis=-1)
        neg = jnp.sum(ex, axis=-1)
        row_loss = -jnp.log(pos / neg + _EPS)                  # [B,Ni]

        pm = point_mask.astype(row_loss.dtype)
        denom = jnp.maximum(jnp.sum(pm), 1.0)
        losses.append(jnp.sum(row_loss * pm) / denom * weight)
    return losses


def cbl_loss(cbl_stages, target, num_classes, stride, temperature=1.0,
             weight=0.1) -> jnp.ndarray:
    """Summed CBL over stages (fps_grouping_network_model.py:58-59 sums the stack)."""
    return sum(cbl_loss_per_stage(cbl_stages, target, num_classes, stride,
                                  temperature, weight))
