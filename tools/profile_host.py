"""Micro-profile the pure-host pipeline phases on a synthetic 100k scan.

The serving host has ONE core (nproc=1): every ms of host numpy serializes
against every other scan's host work, so host-phase cost directly caps
run_many throughput (pipelines/tgn.py). Prints a per-step ms table for
mesh prep (parse/dedup/normalize/normals), boundary resample numpy, and the
1-NN transfer.

Usage: python tools/profile_host.py [--n-side 317]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def t(label, fn, n=5, *a, **k):
    fn(*a, **k)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **k)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:<28s} {dt:8.1f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-side", type=int, default=317)
    args = ap.parse_args()

    from synthetic import write_synthetic_obj

    from toothgroupnetwork_tpu.data.mesh_io import (
        compute_vertex_normals, parse_obj)
    from toothgroupnetwork_tpu.data.scan_prep import (
        dedup_vertices, normalize_scan_vertices)

    tmp = tempfile.mkdtemp(prefix="tgn_hostprof_")
    obj_path = os.path.join(tmp, "scan_lower.obj")
    write_synthetic_obj(obj_path, n_side=args.n_side, seed=1)

    print("mesh prep:")
    v, f = t("parse_obj", parse_obj, 5, obj_path)
    v2, f2 = t("dedup_vertices", dedup_vertices, 5, v, f)
    vn = t("normalize", normalize_scan_vertices, 5, v2)
    nrm = t("vertex_normals", compute_vertex_normals, 5, vn, f2)
    org = np.concatenate([vn, nrm], 1).astype(np.float32)
    print(f"  n_vertices={len(org)}")

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 15, len(org))
    n_bd = 20000

    print("boundary resample numpy (sans device):")
    bd_mask = rng.random(len(org)) < 0.25
    ratio = rng.random(len(org)).astype(np.float32)

    def resample_numpy():
        m = ratio < 0.25
        bd = org[m]
        perm = rng.permutation(bd.shape[0])[:n_bd]
        bd = bd[perm]
        nbd = org[~m]
        return bd, nbd

    t("mask+perm+gather", resample_numpy, 5)

    print("1-NN transfer:")
    final_points = np.ascontiguousarray(
        np.concatenate([org[:24000, :3], org[:20000, :3] + 0.01]))
    from scipy.spatial import cKDTree

    def one_nn():
        tree = cKDTree(final_points)
        _, nn = tree.query(org[:, :3], k=1, workers=-1)
        return nn

    t("cKDTree build+query", one_nn, 3)

    print("centroid clustering (DBSCAN-ish input):")
    from toothgroupnetwork_tpu.postprocess.clustering import (
        get_clustering_labels)

    pts = rng.normal(0, 0.3, (24000, 3)).astype(np.float32)
    cls = (rng.random(24000) < 0.45).astype(np.int32)
    tth = np.linspace(-0.7, 0.7, 14)
    centers = np.stack([tth, 0.3 * tth ** 2, np.zeros_like(tth)], 1)
    a = rng.integers(0, 14, 24000)
    pts[cls != 0] = centers[a[cls != 0]] + rng.normal(
        0, 0.02, (int((cls != 0).sum()), 3))

    t("get_clustering_labels", lambda: get_clustering_labels(pts, cls), 3)


if __name__ == "__main__":
    main()
