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


def fps_sample(feats: np.ndarray, n: int) -> np.ndarray:
    """FPS down to n points (device op); pads by repeating points when fewer."""
    if feats.shape[0] <= n:
        reps = -(-n // feats.shape[0])
        return np.concatenate([feats] * reps, axis=0)[:n]
    import jax.numpy as jnp

    from ..ops import farthest_point_sample

    idx = np.asarray(farthest_point_sample(
        jnp.asarray(feats[:, :3], jnp.float32), n))
    return feats[idx]


def nn_upsample(values: np.ndarray, source_xyz: np.ndarray,
                target_xyz: np.ndarray) -> np.ndarray:
    """1-NN label transfer from sampled points to all original vertices
    (inference_pipeline_sem.py:37-39 KDTree contract)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(source_xyz)
    _, nearest = tree.query(target_xyz, k=1)
    return np.asarray(values).reshape(-1)[nearest]


def class_logits_to_fdi(cls_ids: np.ndarray) -> np.ndarray:
    """Class ids 0..16 → FDI-without-jaw-offset (inference_pipeline_sem.py:33-34:
    ``>=9 → +2`` then ``>0 → +10``)."""
    out = np.asarray(cls_ids).copy()
    out[out >= 9] += 2
    out[out > 0] += 10
    return out
