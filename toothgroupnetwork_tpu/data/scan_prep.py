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
    o3d ``remove_duplicated_vertices``, inference_pipeline_tgn.py:27).

    Hand-rolled lexsort grouping: ``np.unique(axis=0)`` views rows as a
    structured dtype and sorts that (~67 ms at 100k on the single-core
    serving host); a stable 3-key lexsort + adjacent-compare is ~3x faster
    with identical semantics (lexsort stability keeps ascending original
    index within a duplicate group, so the group head IS the first
    occurrence, exactly np.unique's return_index contract)."""
    n = vertices.shape[0]
    if n == 0:
        return vertices, faces
    # Hash prefilter: indexed meshes (obj "v" lists) usually have NO duplicate
    # rows, and proving that costs one u64 row-hash + sort (~10 ms at 100k) vs
    # the full 3-key lexsort (~70 ms). Hash equality is NECESSARY for row
    # equality (x+0.0 canonicalizes -0.0, whose bits differ but which
    # np.unique's comparisons treat as equal), so all-hashes-distinct proves
    # all-rows-distinct and the scan passes through untouched. Hash collisions
    # or real duplicates just mean taking the exact path below.
    canon = np.ascontiguousarray(vertices + 0.0)  # -0.0 -> +0.0, own buffer
    bits = canon.view(np.uint64 if canon.itemsize == 8 else np.uint32)
    cols = [bits[:, c].astype(np.uint64) for c in range(3)]
    h = (cols[0] * np.uint64(0x9E3779B97F4A7C15)
         ^ cols[1] * np.uint64(0xC2B2AE3D27D4EB4F)
         ^ cols[2] * np.uint64(0x165667B19E3779F9))
    if len(np.unique(h)) == n:
        return vertices, faces
    order = np.lexsort((vertices[:, 2], vertices[:, 1], vertices[:, 0]))
    sv = vertices[order]
    is_head = np.empty(n, bool)
    is_head[0] = True
    np.any(sv[1:] != sv[:-1], axis=1, out=is_head[1:])
    group = np.cumsum(is_head) - 1            # group id per sorted row
    first_idx = order[is_head]                # min original index per group
    # output keeps original-order-of-first-occurrence, as np.unique+argsort did
    out_order = np.argsort(first_idx)
    rank = np.empty_like(out_order)
    rank[out_order] = np.arange(len(out_order))
    inverse = np.empty(n, np.intp)            # original row -> group id
    inverse[order] = group
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
