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


_purity_device_jit = None


def _purity_device_fn(org_xyz, sampled_xyz, labels, k: int):
    """[Np,3] x [M,3] -> (ratio [Np], nn1_label [Np]) on device: 40-NN label
    purity + 1-NN label, MXU distances instead of a host KD-tree sweep.
    Jitted ONCE at module scope — a per-call ``jax.jit(partial(...))`` wrapper
    would recompile the 100k x 24k graph on every scan (measured 21 s/scan).

    Exactness: the 1-NN label becomes the boundary points' OUTPUT semantics, so
    its identity is re-derived by an exact re-score of the top-4 approx
    candidates (the approx path's candidate SET always contains the global
    nearest — approx_max_k retains each reduction bin's maximum — but its
    matmul-expansion distances can misorder near-ties; the narrow re-score
    fixes the order at ~1/10 the cost of a full need_dist=True 40-wide
    re-score). The purity RATIO keeps approx-selection membership for the
    other 39 columns — it is a mean over 40 labels and insensitive to
    per-neighbor recall ~0.95."""
    global _purity_device_jit
    if _purity_device_jit is None:
        import jax
        import jax.numpy as jnp

        from ..ops import knn_points
        from ..ops.gather import index_points

        def fn(org_xyz, sampled_xyz, labels, k):
            idx, _ = knn_points(org_xyz, sampled_xyz, k, None, None,
                                need_dist=False)
            # exact re-score of the leading candidates -> true 1-NN identity
            j = min(4, k)
            cand = idx[:, :j]                               # [Np, j]
            cand_xyz = index_points(sampled_xyz, cand)      # [Np, j, 3]
            delta = org_xyz[:, None, :].astype(jnp.float32) - cand_xyz
            d2 = jnp.sum(delta * delta, axis=-1)
            best = jnp.argmin(d2, axis=-1)                  # [Np]
            nn1 = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
            nn1_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
            nn1_lab = jnp.take(labels, nn1)
            lab = jnp.take(labels, idx.reshape(-1)).reshape(idx.shape)
            ratio = jnp.mean((lab == nn1_lab[:, None]).astype(jnp.float32),
                             axis=1)
            # nn1/nn1_d2 let the pipeline SKIP re-solving org->sampled in its
            # final 1-NN transfer (pipelines/tgn.py: the KD-tree then only
            # covers the <=20k boundary points instead of the 44k concat)
            return ratio, nn1_lab, nn1, nn1_d2

        _purity_device_jit = jax.jit(fn, static_argnames=("k",))
    return _purity_device_jit(org_xyz, sampled_xyz, labels, k=k)


def _boundary_purity(org_xyz: np.ndarray, sampled_xyz: np.ndarray,
                     point_labels: np.ndarray, k: int,
                     device_ctx: dict | None = None):
    """Returns (first-label ratio [N], 1-NN label [N], 1-NN index [N],
    1-NN squared distance [N]). Device path on TPU (bucketed query size, one
    compiled executable per size bucket); host KD-tree elsewhere. The device
    1-NN is exact (narrow re-score in _purity_device_fn); only the purity
    ratio's 40-neighbor MEMBERSHIP is approx-selection (recall ~0.95), which
    the mean is insensitive to.

    ``device_ctx`` (optional dict) receives ``org_pad_dev`` — the padded query
    cloud's DEVICE buffer — when the device path runs, so the pipeline's later
    boundary-1-NN dispatch reuses the upload instead of re-transferring 1.2 MB
    through the tunnel."""
    import jax

    n0 = org_xyz.shape[0]
    if jax.default_backend() in ("tpu", "axon") and n0 > 32768:
        import jax.numpy as jnp

        bucket = 8192
        n_pad = -(-n0 // bucket) * bucket
        pad = np.zeros((n_pad, 3), np.float32)
        pad[:n0] = org_xyz
        pad_dev = jnp.asarray(pad)
        if device_ctx is not None:
            device_ctx["org_pad_dev"] = pad_dev
        ratio, nn1_lab, nn1, nn1_d2 = jax.device_get(_purity_device_fn(
            pad_dev, jnp.asarray(sampled_xyz),
            jnp.asarray(point_labels.astype(np.int32)), k))
        return ratio[:n0], nn1_lab[:n0], nn1[:n0], nn1_d2[:n0]

    tree = cKDTree(sampled_xyz)
    dist, nn = tree.query(org_xyz, k=k, workers=-1)
    nn = np.atleast_2d(nn)
    dist = np.atleast_2d(dist)
    return (first_label_ratio(point_labels[nn]), point_labels[nn[:, 0]],
            nn[:, 0], (dist[:, 0] ** 2).astype(np.float32))


def boundary_sampled_feats(
    point_labels: np.ndarray,
    org_feats: np.ndarray,
    sampled_feats: np.ndarray,
    bdl_ratio: float = 0.7,
    num_bdl_points: int = 20000,
    num_all_points: int = 24000,
    rng: np.random.Generator | None = None,
    spatial_sort: bool = False,
    return_nn1: bool = False,
    device_ctx: dict | None = None,
):
    """Returns (feats [num_all_points, 6], pseudo_labels [num_all_points],
    n_boundary) — boundary points first, matching the reference's concat order
    (inference_pipeline_tgn.py:311-318). With ``return_nn1``, additionally
    returns ``(nn1_idx [N], nn1_d2 [N])`` — each org vertex's exact nearest
    SAMPLED point (index + squared distance), a free byproduct of the purity
    query that the tgn pipeline reuses in its final 1-NN transfer.

    Args:
      point_labels: [M] instance labels of the sampled cloud (0 = gingiva).
      org_feats: [N, 6] full-resolution features to resample from.
      sampled_feats: [M, 6] the stage-1 sampled cloud.
    """
    rng = rng or np.random.default_rng(0)
    k = min(40, sampled_feats.shape[0])
    ratio, ps_labels, nn1_idx, nn1_d2 = _boundary_purity(
        org_feats[:, :3].astype(np.float32), sampled_feats[:, :3], point_labels,
        k, device_ctx)
    bd_mask = ratio < bdl_ratio

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

    if spatial_sort:
        # sort WITHIN each segment (boundary block, then rest) so the
        # boundary-first concat contract ([:n_bd] slicing downstream) is
        # preserved while the cloud gains the sorted-cell locality the
        # super-row attention path needs (ops/cells.py)
        from ..ops.cells import spatial_sort_perm

        if bd_feats.shape[0]:
            o = spatial_sort_perm(bd_feats[:, :3])
            bd_feats, bd_labels = bd_feats[o], bd_labels[o]
        if non_bd_feats.shape[0]:
            o = spatial_sort_perm(non_bd_feats[:, :3])
            non_bd_feats, non_bd_labels = non_bd_feats[o], non_bd_labels[o]

    feats = np.concatenate([bd_feats, non_bd_feats], axis=0)
    labels = np.concatenate([bd_labels, non_bd_labels], axis=0)
    if return_nn1:
        return (feats.astype(np.float32), labels, bd_feats.shape[0],
                nn1_idx, nn1_d2)
    return feats.astype(np.float32), labels, bd_feats.shape[0]
