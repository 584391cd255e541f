"""Shared inference-time mesh preparation.

Reproduces the reference pipelines' prep (inference_pipeline_sem.py:17-28 /
inference_pipeline_tgn.py:24-43):
  * load mesh, center xyz by mean,
  * scale ALL axes by this scan's y-extent: ``(v − min(y)) / (max(y) − min(y)) *
    1.8 − 0.8`` (scaler/shifter constants, inference_pipeline_tgn.py:12-13) — note
    this deliberately differs from the fixed-constant normalization used in offline
    preprocessing,
  * midpoint-subdivide once if the mesh has <24k vertices,
  * FPS-sample exactly 24000 points of xyz+normal features.

Device boundary design (SURVEY.md §2.8): prep is host numpy except FPS (device);
model forwards are single jitted calls; clustering/fusion is host-side postprocess.
"""

from __future__ import annotations

import numpy as np

from ..data.mesh_io import compute_vertex_normals, parse_obj, subdivide_midpoint

SCALER = 1.8
SHIFTER = 0.8
N_SAMPLE = 24000


def prep_mesh(stl_path: str, n_sample: int = N_SAMPLE):
    """Returns ``(org_feats [N0,6], sampled_feats [n_sample,6])`` — original-vertex
    features (pre-subdivision, the 1-NN upsample targets) and the FPS-sampled model
    input."""
    vertices, faces = parse_obj(stl_path)
    vertices = vertices.copy()
    vertices -= vertices.mean(axis=0)
    ymin, ymax = vertices[:, 1].min(), vertices[:, 1].max()
    vertices = (vertices - ymin) / (ymax - ymin) * SCALER - SHIFTER

    normals = compute_vertex_normals(vertices, faces)
    org_feats = np.concatenate([vertices, normals], axis=1)

    if vertices.shape[0] < n_sample:
        vertices, faces = subdivide_midpoint(vertices, faces, 1)
        normals = compute_vertex_normals(vertices, faces)
    feats = np.concatenate([vertices, normals], axis=1)

    sampled = fps_sample(feats, n_sample)
    return org_feats.astype(np.float32), sampled.astype(np.float32)


_FPS_BUCKET = 8192


def fps_sample_idx(xyz: np.ndarray, n: int) -> np.ndarray:
    """Device-FPS indices for a host cloud of ARBITRARY size.

    Pads the point count up to a multiple of 8192 with a validity mask so that
    every scan size in a bucket shares ONE compiled executable — unbucketed,
    each new mesh size would trigger a fresh XLA compile (minutes through the
    tunneled chip; the scan sizes of a production stream are all distinct).
    """
    import jax.numpy as jnp

    from ..ops import farthest_point_sample

    n0 = xyz.shape[0]
    n_pad = -(-n0 // _FPS_BUCKET) * _FPS_BUCKET
    pad = np.zeros((n_pad, 3), np.float32)
    pad[:n0] = xyz[:, :3]
    mask = np.zeros(n_pad, bool)
    mask[:n0] = True
    # bucket the sample count as well (it varies per scan too): FPS is greedy-
    # sequential, so the first n samples of an m-sample run ARE FPS(n)
    n_bucket = min(-(-n // 512) * 512, n0)
    idx = np.asarray(farthest_point_sample(
        jnp.asarray(pad), n_bucket, jnp.asarray(mask)))
    return idx[:n]


def fps_sample(feats: np.ndarray, n: int) -> np.ndarray:
    """FPS down to n points (device op); pads by repeating points when fewer."""
    if feats.shape[0] <= n:
        reps = -(-n // feats.shape[0])
        return np.concatenate([feats] * reps, axis=0)[:n]
    return feats[fps_sample_idx(feats[:, :3], n)]


def nn_upsample(values: np.ndarray, source_xyz: np.ndarray,
                target_xyz: np.ndarray) -> np.ndarray:
    """1-NN label transfer from sampled points to all original vertices
    (inference_pipeline_sem.py:37-39 KDTree contract). Host KD-tree on
    purpose: measured 70 ms vs 143 ms for a device MXU brute-force variant at
    [100k x 48k] — low-dimensional trees prune too well to beat."""
    from scipy.spatial import cKDTree

    tree = cKDTree(source_xyz)
    _, nearest = tree.query(target_xyz, k=1, workers=-1)
    return np.asarray(values).reshape(-1)[nearest]


def class_logits_to_fdi(cls_ids: np.ndarray) -> np.ndarray:
    """Class ids 0..16 → FDI-without-jaw-offset (inference_pipeline_sem.py:33-34:
    ``>=9 → +2`` then ``>0 → +10``)."""
    out = np.asarray(cls_ids).copy()
    out[out >= 9] += 2
    out[out > 0] += 10
    return out
