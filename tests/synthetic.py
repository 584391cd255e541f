"""Synthetic dental-scan generators shared across tests.

Builds jaw-arch-shaped meshes/point clouds with plausible tooth instances so the full
preprocess → train → inference → eval path can run without the (license-gated)
3DTeethSeg dataset.
"""

import json
import os

import numpy as np


def make_synthetic_jaw_points(n_points=2400, n_teeth=8, seed=0, jaw="lower"):
    """Point cloud shaped like a dental arch with ``n_teeth`` blobs + gingiva band.

    Returns (points [n,3] float32, fdi_labels [n] int, class_labels [n] int).
    class label: 0 gingiva, 1..16 tooth slots.
    """
    rng = np.random.default_rng(seed)
    pts, cls = [], []
    n_gum = n_points // 3
    # gingiva: band along the arch
    t = rng.uniform(-1, 1, n_gum)
    gum = np.stack([t, 0.6 * t ** 2, rng.uniform(-0.1, 0.0, n_gum)], -1)
    gum += rng.normal(0, 0.01, gum.shape)
    pts.append(gum)
    cls.append(np.zeros(n_gum, np.int64))
    # teeth: blobs placed along the arch, split left/right
    n_per = (n_points - n_gum) // n_teeth
    for i in range(n_teeth):
        # alternate right (classes 1..8) / left (classes 9..16)
        side = i % 2
        pos_idx = i // 2 + 1
        label = pos_idx + 8 * side
        x = (pos_idx / 5.0) * (1 if side == 0 else -1)
        center = np.array([x, 0.6 * x ** 2, 0.08])
        blob = center + rng.normal(0, 0.025, (n_per, 3))
        pts.append(blob)
        cls.append(np.full(n_per, label, np.int64))
    pts = np.concatenate(pts).astype(np.float32)
    cls = np.concatenate(cls)
    # pad remainder as gingiva
    rem = n_points - len(pts)
    if rem > 0:
        extra = gum[rng.integers(0, n_gum, rem)]
        pts = np.concatenate([pts, extra.astype(np.float32)])
        cls = np.concatenate([cls, np.zeros(rem, np.int64)])
    # class -> FDI (inverse of preprocess remap)
    fdi = cls.copy()
    fdi[cls >= 9] += 2
    fdi[cls > 0] += 10
    if jaw == "lower":
        fdi[cls > 0] += 20
    return pts, fdi, cls


def write_synthetic_obj(path, n_side=30, seed=0, scale=40.0):
    """Write a small grid-mesh .obj (a curved sheet) and return (verts, faces)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-1, 1, n_side)
    ys = np.linspace(-1, 1, n_side)
    verts = []
    for y in ys:
        for x in xs:
            z = 0.3 * x ** 2 + 0.1 * np.sin(3 * y) + rng.normal(0, 0.002)
            verts.append((scale * x, scale * y, scale * 0.3 * z))
    faces = []
    for j in range(n_side - 1):
        for i in range(n_side - 1):
            a = j * n_side + i
            b = a + 1
            c = a + n_side
            d = c + 1
            faces.append((a, b, c))
            faces.append((b, d, c))
    verts = np.array(verts)
    faces = np.array(faces, np.int64)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    return verts, faces


def make_synthetic_arch_mesh(seed=0, ns=160, nu=40, n_teeth=12, scale=40.0):
    """Jaw-arch SHEET MESH with gaussian tooth bumps + per-vertex class labels.

    A parametric grid over (s: along-arch in [-1,1], u: across-arch): the sheet
    follows the arch centerline (s, 0.9 s^2) in the horizontal plane; teeth are
    z-bumps at ``n_teeth`` stations along the arch. Labels: 0 gingiva; right
    side (x>0) positions p=1..7 -> class p; left side p=1 -> class 9 (left
    central incisor), p>=2 -> class 8+p — matching the arch-disambiguation
    contract (postprocess/fusion.py; reference inference_pipeline_tgn.py:68-126).

    Returns (verts [V,3] float32 in mm, faces [F,3] int64, cls [V] int64 0..16).
    """
    rng = np.random.default_rng(seed)
    per_side = n_teeth // 2
    # tooth stations in s, mirrored; jitter per scan. Teeth sized so the
    # foreground fraction (~45%) and per-tooth point share match the density
    # regime the reference clustering constants assume (DBSCAN eps=.03,
    # min_samples=30 needs tens of points within eps after offset collapse).
    s_right = 0.12 + 0.15 * np.arange(per_side)
    s_pos = np.concatenate([s_right, -s_right])
    s_pos = s_pos + rng.normal(0, 0.008, s_pos.shape)
    classes = np.concatenate([np.arange(1, per_side + 1),               # right
                              np.array([9] + [8 + p for p in
                                              range(2, per_side + 1)])])  # left
    u_c = 0.0
    r_bump, r_label, h = 0.062, 0.075, 0.14

    ss = np.linspace(-1, 1, ns)
    us = np.linspace(-0.12, 0.12, nu)
    S, U = np.meshgrid(ss, us, indexing="ij")            # [ns, nu]
    # centerline + in-plane normal
    a = 0.9
    cx, cy = S, a * S ** 2
    tnorm = np.sqrt(1 + (2 * a * S) ** 2)
    nx, ny = -2 * a * S / tnorm, 1.0 / tnorm
    X = cx + U * nx
    Y = cy + U * ny
    Z = np.zeros_like(X)
    D2 = np.full_like(X, np.inf)
    NEAREST = np.zeros(X.shape, np.int64)
    for k in range(n_teeth):
        d2 = (S - s_pos[k]) ** 2 + (U - u_c) ** 2
        Z += h * np.exp(-d2 / r_bump ** 2)
        closer = d2 < D2
        D2 = np.where(closer, d2, D2)
        NEAREST = np.where(closer, classes[k], NEAREST)
    Z += rng.normal(0, 0.002, Z.shape)
    cls = np.where(D2 < r_label ** 2, NEAREST, 0).reshape(-1)

    verts = np.stack([X, Y, 0.35 * Z], -1).reshape(-1, 3) * scale
    faces = []
    for i in range(ns - 1):
        for j in range(nu - 1):
            v0 = i * nu + j
            faces.append((v0, v0 + 1, v0 + nu))
            faces.append((v0 + 1, v0 + nu + 1, v0 + nu))
    return (verts.astype(np.float32), np.array(faces, np.int64), cls)


def class_to_fdi(cls: np.ndarray) -> np.ndarray:
    """Class 0..16 -> FDI-without-jaw-offset (pipelines/base.py contract)."""
    fdi = np.asarray(cls).copy()
    fdi[fdi >= 9] += 2
    fdi[fdi > 0] += 10
    return fdi


def write_arch_case(tmpdir, case="ARCH01", seed=0, ns=160, nu=40):
    """Write a synthetic arch-mesh .obj + its per-vertex GT classes.

    Returns (obj_path, cls [V] 0..16)."""
    os.makedirs(tmpdir, exist_ok=True)
    verts, faces, cls = make_synthetic_arch_mesh(seed=seed, ns=ns, nu=nu)
    obj_path = os.path.join(tmpdir, f"{case}_upper.obj")
    with open(obj_path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    return obj_path, cls


def write_synthetic_case(tmpdir, case="CASE01", jaw="lower", n_side=30, seed=0):
    """Write an .obj + challenge-format labels .json for one synthetic case.

    Labels are assigned to mesh vertices from the synthetic arch labeler so classes
    are spatially coherent. Returns (obj_path, json_path, n_vertices).
    """
    obj_dir = os.path.join(tmpdir, "objs", case)
    json_dir = os.path.join(tmpdir, "jsons", case)
    os.makedirs(obj_dir, exist_ok=True)
    os.makedirs(json_dir, exist_ok=True)
    obj_path = os.path.join(obj_dir, f"{case}_{jaw}.obj")
    verts, _ = write_synthetic_obj(obj_path, n_side=n_side, seed=seed)
    n = len(verts)
    rng = np.random.default_rng(seed + 1)
    # spatially coherent labels: x-position bins -> tooth classes, low z -> gingiva
    x = verts[:, 0] / np.abs(verts[:, 0]).max()
    cls = np.clip((np.abs(x) * 8).astype(np.int64) + 1, 1, 8)
    cls[x < 0] += 8
    gum = verts[:, 2] < np.median(verts[:, 2])
    cls[gum] = 0
    fdi = cls.copy()
    fdi[cls >= 9] += 2
    fdi[cls > 0] += 10
    if jaw == "lower":
        fdi[cls > 0] += 20
    instances = np.where(cls > 0, cls, 0)
    json_path = os.path.join(json_dir, f"{case}_{jaw}.json")
    with open(json_path, "w") as f:
        json.dump({
            "jaw": jaw,
            "labels": fdi.tolist(),
            "instances": instances.tolist(),
        }, f)
    return obj_path, json_path, n


def write_processed_npy(tmpdir, case="CASE01", jaw="lower", n_points=2400,
                        n_teeth=8, seed=0, n_file_points=None):
    """Write a preprocessed ``*_sampled_points.npy`` (n,7) directly (skipping mesh IO)
    for dataset/training tests. Coordinates are already in the normalized regime."""
    pts, _, cls = make_synthetic_jaw_points(n_points, n_teeth, seed, jaw)
    normals = np.zeros_like(pts)
    normals[:, 2] = 1.0
    arr = np.concatenate([pts, normals, cls[:, None].astype(np.float32)], axis=1)
    if n_file_points and n_file_points > n_points:
        pad = np.zeros((n_file_points - n_points, 7), np.float32)
        arr = np.concatenate([arr, pad])
    os.makedirs(tmpdir, exist_ok=True)
    path = os.path.join(tmpdir, f"{case}_{jaw}_sampled_points.npy")
    np.save(path, arr.astype(np.float32))
    if n_file_points and n_file_points > n_points:
        with open(path[:-4] + ".meta.json", "w") as f:
            json.dump({"n_valid": int(n_points)}, f)
    return path
