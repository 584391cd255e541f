"""Host-side inference scan prep — deliberately JAX-FREE.

The pure-numpy portion of the inference pipelines' mesh prep (reference:
inference_pipelines/inference_pipeline_tgn.py:24-43 /
inference_pipeline_sem.py:17-28): obj parse, vertex dedup, per-scan y-extent
normalization, vertex normals, optional midpoint subdivision. The device FPS
sampling stays in ``pipelines.base`` — this split exists so ``run_many`` can
prefetch mesh prep in SPAWNED WORKER PROCESSES (true parallelism past the
GIL) without the workers importing JAX or touching the TPU: this module's
import closure is numpy-only (like the rest of ``data/``).
"""

from __future__ import annotations

import numpy as np

from .mesh_io import compute_vertex_normals, parse_obj, subdivide_midpoint

# per-scan normalization constants (inference_pipeline_tgn.py:12-13)
SCALER = 1.8
SHIFTER = 0.8
N_SAMPLE = 24000


def warm_worker(_i: int = 0) -> bool:
    """Prep-pool warmup target: spawning a worker pays the python + numpy
    import cost here, outside any batch's timing (pipelines/tgn.py:_prep_pool)."""
    return True


def normalize_scan_vertices(vertices: np.ndarray) -> np.ndarray:
    """Mean-center, then scale ALL axes by this scan's y-extent:
    ``(v − min(y)) / (max(y) − min(y)) * 1.8 − 0.8`` — note this deliberately
    differs from the fixed-constant normalization used in offline
    preprocessing (data/preprocess.py)."""
    vertices = vertices - vertices.mean(axis=0)
    ymin, ymax = vertices[:, 1].min(), vertices[:, 1].max()
    return (vertices - ymin) / (ymax - ymin) * SCALER - SHIFTER


def dedup_vertices(vertices: np.ndarray, faces: np.ndarray):
    """Remove duplicated vertices keeping first occurrence (the reference's
    o3d ``remove_duplicated_vertices``, inference_pipeline_tgn.py:27)."""
    _, first_idx, inverse = np.unique(vertices, axis=0, return_index=True,
                                      return_inverse=True)
    order = np.argsort(first_idx)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    new_vertices = vertices[np.sort(first_idx)]
    new_faces = rank[inverse][faces] if faces.size else faces
    return new_vertices, new_faces


def prep_scan_host_tgn(stl_path: str, n_sample: int = N_SAMPLE):
    """tgn-pipeline host prep: returns ``(org_feats [N0,6], bdl_feats [N1,6])``
    — original-vertex features (post-dedup; the 1-NN output targets) and the
    boundary-resampling source (midpoint-subdivided when the mesh is smaller
    than ``n_sample``). The caller FPS-samples ``bdl_feats`` on device."""
    vertices, faces = parse_obj(stl_path)
    vertices, faces = dedup_vertices(vertices, faces)
    vertices = normalize_scan_vertices(vertices)

    normals = compute_vertex_normals(vertices, faces)
    org_feats = np.concatenate([vertices, normals], axis=1)

    if vertices.shape[0] < n_sample:
        sub_v, sub_f = subdivide_midpoint(vertices, faces, 1)
        sub_n = compute_vertex_normals(sub_v, sub_f)
        bdl_feats = np.concatenate([sub_v, sub_n], axis=1)
    else:
        bdl_feats = org_feats.copy()
    return org_feats.astype(np.float32), bdl_feats.astype(np.float32)
