"""Run the ACTUAL reference tgn InferencePipeLine on CPU for whole-pipeline
parity tests (round-3 verdict stretch item 9).

``inference_pipelines/inference_pipeline_tgn.py`` imports open3d, trimesh and
matplotlib (none available in this image) and runs everything through CUDA
tensors. This module installs minimal fakes BEFORE importing it:

  * ``open3d``: a TriangleMesh backed by this framework's own mesh ops
    (``data.mesh_io``: parse/normals/subdivide, ``data.scan_prep``:
    dedup) — the same algorithms our pipeline uses, so the mesh-prep inputs
    to both pipelines are identical by construction,
  * ``trimesh``: ``load_mesh(path, process=False)`` via ``parse_obj``
    (order-preserving, like trimesh with process=False),
  * ``matplotlib``: an empty shell (only imported, never used on this path),
  * pointops + ``.cuda()`` no-ops come from ``ref_cbl`` (imported first).

Import ``build_reference_tgn_pipeline`` AFTER tests/conftest.py; torch stays
CPU-only.
"""

from __future__ import annotations

import sys
import types

import numpy as np

import ref_cbl  # adds /root/reference to sys.path

ref_cbl.install()  # pointops stub + torch .cuda() no-ops


def _install_fakes():
    from toothgroupnetwork_tpu.data.mesh_io import (compute_vertex_normals,
                                                    parse_obj,
                                                    subdivide_midpoint)
    from toothgroupnetwork_tpu.data.scan_prep import dedup_vertices

    if "matplotlib" not in sys.modules:
        mpl = types.ModuleType("matplotlib")
        plt = types.ModuleType("matplotlib.pyplot")
        mpl.pyplot = plt
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.pyplot"] = plt

    if "trimesh" not in sys.modules:
        tm = types.ModuleType("trimesh")

        def load_mesh(path, process=False):
            v, f = parse_obj(path)
            return types.SimpleNamespace(vertices=v, faces=f)

        tm.load_mesh = load_mesh
        sys.modules["trimesh"] = tm

    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")

        class TriangleMesh:
            def __init__(self):
                self.vertices = np.zeros((0, 3))
                self.triangles = np.zeros((0, 3), np.int64)
                self._normals = None

            # --- o3d API surface used by gen_utils + the tgn pipeline ---
            def compute_vertex_normals(self):
                self._normals = compute_vertex_normals(
                    np.asarray(self.vertices, np.float64),
                    np.asarray(self.triangles, np.int64))
                return self

            @property
            def vertex_normals(self):
                if self._normals is None:
                    self.compute_vertex_normals()
                return self._normals

            @vertex_normals.setter
            def vertex_normals(self, v):
                self._normals = np.asarray(v)

            def remove_duplicated_vertices(self):
                v, f = dedup_vertices(np.asarray(self.vertices),
                                      np.asarray(self.triangles))
                self.vertices, self.triangles = v, f
                self._normals = None
                return self

            def subdivide_midpoint(self, number_of_iterations=1):
                v, f = np.asarray(self.vertices), np.asarray(self.triangles)
                v, f = subdivide_midpoint(v, f, number_of_iterations)
                m = TriangleMesh()
                m.vertices, m.triangles = v, f
                return m

        class _Geometry(types.SimpleNamespace):
            pass

        o3d.geometry = _Geometry(TriangleMesh=TriangleMesh)
        o3d.utility = _Geometry(
            Vector3dVector=lambda x: np.asarray(x, np.float64),
            Vector3iVector=lambda x: np.asarray(x, np.int64))
        o3d.io = _Geometry()
        o3d.visualization = _Geometry()
        sys.modules["open3d"] = o3d


_install_fakes()


def make_reference_checkpoints(tmpdir, seed: int = 0):
    """Random-init reference GroupingNetworkModules (fps + bdl arch), saved as
    torch checkpoints. Returns (fps_ckpt_path, bdl_ckpt_path, fps_sd, bdl_sd).
    """
    import torch

    from models.modules.grouping_network_module import GroupingNetworkModule

    torch.manual_seed(seed)
    fps_cfg = {"model_parameter": {
        "input_feat": 6, "stride": [1, 4, 4, 4, 4],
        "nsample": [36, 24, 24, 24, 24], "blocks": [2, 3, 4, 6, 3],
        "block_num": 5, "planes": [32, 64, 128, 256, 512],
        "crop_sample_size": 3072}}
    bdl_cfg = {"model_parameter": {
        "input_feat": 6, "stride": [1, 1],
        "nsample": [36, 24], "blocks": [2, 3],
        "block_num": 2, "planes": [16, 32],
        "crop_sample_size": 3072}}
    fps_mod = GroupingNetworkModule(fps_cfg)
    bdl_mod = GroupingNetworkModule(bdl_cfg)
    # NOTE: random-init weights cannot drive the full pipelines — the
    # reference hard-crashes on degenerate predictions (empty-foreground
    # DBSCAN at ops_utils.py:95, PCA over <3 instance centers at
    # inference_pipeline_tgn.py:76) and a random net cannot be made to
    # reliably satisfy its happy-path branch preconditions. The pipeline
    # parity test therefore INJECTS structured leaf models on both stacks
    # (see make_structured_leaf_models / FakeTGNet) and uses these random
    # checkpoints only to CONSTRUCT the pipelines.
    fps_path = str(tmpdir / "ref_fps.h5")
    bdl_path = str(tmpdir / "ref_bdl.h5")
    torch.save(fps_mod.state_dict(), fps_path)
    torch.save(bdl_mod.state_dict(), bdl_path)
    return fps_path, bdl_path, fps_cfg, bdl_cfg


def build_reference_tgn_pipeline(fps_ckpt: str, bdl_ckpt: str,
                                 fps_cfg: dict, bdl_cfg: dict):
    """The actual reference ``InferencePipeLine`` (tgn), CPU-patched."""
    from inference_pipelines.inference_pipeline_tgn import InferencePipeLine

    config = {
        "fps_model_info": {**fps_cfg, "load_ckpt_path": fps_ckpt},
        "boundary_model_info": {**bdl_cfg, "load_ckpt_path": bdl_ckpt},
        "boundary_sampling_info": {
            "bdl_ratio": 0.7, "num_of_bdl_points": 20000,
            "num_of_all_points": 24000},
    }
    return InferencePipeLine(config)


# ---------------------------------------------------------------------------
# Structured leaf models for WHOLE-pipeline parity (test_ref_pipeline_parity)
# ---------------------------------------------------------------------------
#
# Both stacks' pipelines are driven with the same deterministic tooth-like
# predictor in place of the trained backbones (random init cannot satisfy the
# reference's happy-path branch preconditions — see the note in
# make_reference_checkpoints). The predictor is a pure function of the input
# coordinates, so every HOST/DEVICE algorithm downstream of the nets — FPS,
# cropping, vote aggregation, DBSCAN/MeanShift/KMeans instancing, boundary
# purity resampling, arch disambiguation, boundary-cluster fusion, final 1-NN
# transfer, FDI remap — runs its full production path on identical inputs.
#
# Geometry: T tooth centers; points within `radius` of a center get sem class
# (t % 9) + 1 (classes 1..9 so the 11/12-incisor arch branch at
# inference_pipeline_tgn.py:78 is exercised); points within `pull_radius` are
# offset-contracted 10x toward the center, so moved-point clusters are tight
# (DBSCAN-clean), non-degenerate (no zero-variance PCA), and well-separated
# (no MeanShift resplit — where the documented bin_seeding deviation lives).
# Crop-stage (binary) foreground: within `radius` of the CENTERED crop origin.

STRUCT_RADIUS = 0.05
STRUCT_PULL_RADIUS = 0.12
STRUCT_CONTRACT = 0.9
# A thin dmin band of foreground points is flung to an isolated ring of radius
# STRAY_R around its tooth center instead of being pulled in. These ~5-10
# points per tooth are farther than DBSCAN eps (.03) from every cluster and
# from each other, so both stacks' DBSCAN labels them NOISE — exercising the
# 10-NN noise-absorption branch (ops_utils.py:134-142), whose empty-query
# crash (`tree.query` on a 0-row array at ops_utils.py:135) is otherwise a
# happy-path precondition the reference imposes on its trained predictors.
STRUCT_STRAY_BAND = (0.046, 0.05)
STRUCT_STRAY_R = 0.25
# Crop-stage (binary) logits are ASYMMETRIC: confident foreground (+80) vs
# weak background (+4). The vote aggregation SUMS logits over overlapping
# crops (inference_pipeline_tgn.py:186-194 / our _device_votes) and each tooth
# is foreground only in its own crop while appearing as background in up to 15
# neighbors' crops — symmetric one-hot votes would zero out every tooth
# (bg-votes >= fg-votes for any point in >= 2 crops), which is also why
# trained reference checkpoints emit near-saturated fg logits. 80 > 4 * 16
# keeps one fg vote decisive against every possible bg vote.
STRUCT_FG_LOGIT = 80.0
STRUCT_BG_LOGIT = 4.0


def pick_tooth_centers(vertices: np.ndarray, t: int = 9) -> np.ndarray:
    """T arch points spread along central-x quantiles of a normalized scan,
    restricted to a central y band. INTERIOR placement matters: the crop stage
    gathers each centroid's 3072-NN ball and centers it by its MEAN
    (ops_utils.py:164-169); a tooth near the scan edge gets a clipped,
    asymmetric ball whose mean sits ~0.2 away from the tooth, which breaks the
    structured stage-2 predictor's |centered xyz| < radius foreground rule."""
    v = vertices
    yc = np.median(v[:, 1])
    band = v[np.abs(v[:, 1] - yc) < 0.15]
    order = np.argsort(band[:, 0], kind="stable")
    q = (np.arange(t) + 0.5) / t * 0.7 + 0.15   # central 70% of the x range
    rows = order[(q * len(order)).astype(int)]
    return band[rows, :3].astype(np.float32)


def make_structured_leaf_models(centers: np.ndarray):
    """Torch replacements for first_ins_cent_model / second_ins_cent_model.

    Interface contract (grouping_network_module.py:13-14, 36, 91):
    ``model([x])`` with x [B, C, N] -> (sem [B, K, N], offset [B, 3, N],
    mask [B, 2, N], features [B, 32, N]).
    """
    import torch

    c_t = torch.from_numpy(centers.astype(np.float32))        # [T, 3]

    class _FakeFirst(torch.nn.Module):
        def forward(self, inputs):
            x = inputs[0]
            b, _, n = x.shape
            xyz = x[:, :3, :].permute(0, 2, 1).float()        # [B, N, 3]
            d = torch.cdist(xyz.reshape(-1, 3), c_t).reshape(b, n, -1)
            dmin, t = d.min(dim=-1)
            fg = dmin < STRUCT_RADIUS
            cls = torch.where(fg, (t % 9) + 1, torch.zeros_like(t))
            sem = torch.nn.functional.one_hot(cls, 10).float() * 8.0
            pull = (dmin < STRUCT_PULL_RADIUS)[..., None]
            off = torch.where(pull, STRUCT_CONTRACT * (c_t[t] - xyz),
                              torch.zeros_like(xyz))
            stray = ((dmin > STRUCT_STRAY_BAND[0])
                     & (dmin < STRUCT_STRAY_BAND[1]))[..., None]
            off = torch.where(
                stray, (xyz - c_t[t]) * (STRUCT_STRAY_R / dmin - 1.0)[..., None],
                off)
            mask = torch.nn.functional.one_hot(fg.long(), 2).float() * 8.0
            feats = torch.zeros(b, 32, n)
            return (sem.permute(0, 2, 1), off.permute(0, 2, 1),
                    mask.permute(0, 2, 1), feats)

    class _FakeSecond(torch.nn.Module):
        def forward(self, inputs):
            x = inputs[0]                                     # CENTERED crops
            b, _, n = x.shape
            xyz = x[:, :3, :].permute(0, 2, 1).float()
            fg = xyz.norm(dim=-1) < STRUCT_RADIUS
            sem = (torch.nn.functional.one_hot(fg.long(), 2).float()
                   * torch.tensor([STRUCT_BG_LOGIT, STRUCT_FG_LOGIT]))
            off = torch.zeros_like(xyz)
            return (sem.permute(0, 2, 1), off.permute(0, 2, 1), sem.clone()
                    .permute(0, 2, 1), torch.zeros(b, 32, n))

    return _FakeFirst(), _FakeSecond()


def inject_structured_models(ref_pipe, centers: np.ndarray):
    """Swap the leaf nets of BOTH GroupingNetworkModules of the reference
    pipeline for the structured predictors (everything else stays real)."""
    for mod in (ref_pipe.first_module, ref_pipe.bdl_module):
        fake1, fake2 = make_structured_leaf_models(centers)
        mod.first_ins_cent_model = fake1
        mod.second_ins_cent_model = fake2
    return ref_pipe
