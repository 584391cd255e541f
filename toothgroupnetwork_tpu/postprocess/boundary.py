"""Boundary-aware resampling.

The tgnet second-stage data engine (reference: inference_pipeline_tgn.py:289-330 at
inference; bdl_grouping_netowrk_model.py:133-192 at training): given per-point
instance labels on the 24k sampled cloud, label the full-resolution mesh by 1-NN,
score each full-res vertex's 40-NN label purity, mark vertices below
``bdl_ratio`` (0.7) as boundary, then build a boundary-focused 24k cloud =
20000 uniformly-sampled boundary points + FPS of the rest.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from .clustering import first_label_ratio


def boundary_sampled_feats(
    point_labels: np.ndarray,
    org_feats: np.ndarray,
    sampled_feats: np.ndarray,
    bdl_ratio: float = 0.7,
    num_bdl_points: int = 20000,
    num_all_points: int = 24000,
    rng: np.random.Generator | None = None,
):
    """Returns (feats [num_all_points, 6], pseudo_labels [num_all_points],
    n_boundary) — boundary points first, matching the reference's concat order
    (inference_pipeline_tgn.py:311-318).

    Args:
      point_labels: [M] instance labels of the sampled cloud (0 = gingiva).
      org_feats: [N, 6] full-resolution features to resample from.
      sampled_feats: [M, 6] the stage-1 sampled cloud.
    """
    rng = rng or np.random.default_rng(0)
    tree = cKDTree(sampled_feats[:, :3])
    k = min(40, sampled_feats.shape[0])
    _, nn40 = tree.query(org_feats[:, :3], k=k, workers=-1)
    nn40 = np.atleast_2d(nn40)
    ratio = first_label_ratio(point_labels[nn40])
    bd_mask = ratio < bdl_ratio

    # column 0 of the 40-NN query IS the 1-NN — no second tree pass needed
    ps_labels = point_labels[nn40[:, 0]]

    bd_feats = org_feats[bd_mask]
    bd_labels = ps_labels[bd_mask]
    # uniform resample of boundary points to num_bdl_points (truncates when fewer)
    perm = rng.permutation(bd_feats.shape[0])[:num_bdl_points]
    bd_feats, bd_labels = bd_feats[perm], bd_labels[perm]

    non_bd_feats = org_feats[~bd_mask]
    non_bd_labels = ps_labels[~bd_mask]
    need = num_all_points - bd_feats.shape[0]
    if non_bd_feats.shape[0] > need:
        from ..pipelines.base import fps_sample_idx

        # bucketed device FPS: the non-boundary count varies per scan, and an
        # unbucketed call would recompile for every distinct size
        idx = fps_sample_idx(non_bd_feats[:, :3], need)
    else:
        # not enough non-boundary points: take all + repeat uniformly
        reps = rng.integers(0, max(non_bd_feats.shape[0], 1),
                            need - non_bd_feats.shape[0])
        idx = np.concatenate([np.arange(non_bd_feats.shape[0]), reps])
    non_bd_feats, non_bd_labels = non_bd_feats[idx], non_bd_labels[idx]

    feats = np.concatenate([bd_feats, non_bd_feats], axis=0)
    labels = np.concatenate([bd_labels, non_bd_labels], axis=0)
    return feats.astype(np.float32), labels, bd_feats.shape[0]
