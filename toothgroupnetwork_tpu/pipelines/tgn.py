"""tgnet two-stage inference pipeline — the flagship end-to-end path.

Faithful rebuild of the reference's tgn pipeline (reference:
inference_pipelines/inference_pipeline_tgn.py:10-330), restructured so the device
work is a handful of jitted static-shape calls and everything between is host numpy
(SURVEY.md §3.4 lists the reference's ≥6 ad-hoc device↔host round trips):

  1. mesh prep: dedup vertices, center, per-scan y-extent scale, subdivide if <24k,
     FPS to 24000,
  2. fps model stage 1 (jit): 10-class half-arch sem + offsets,
  3. host: DBSCAN/PCA/MeanShift instancing of offset-moved points → crop centroids,
  4. fps model stage 2 (jit) over 16 padded crops → per-crop FG/BG logits,
  5. host: vote aggregation → refined FG mask → final stage-1 instancing,
  6. host: boundary-purity resampling (20k boundary + 4k FPS),
  7. bdl model stage 1+2 (jit) on the boundary cloud, KMeans instancing,
  8. host: PCA arch disambiguation (9→16 classes) + boundary-cluster fusion,
  9. 1-NN transfer to all original vertices + FDI remap.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tgnet import TGNet, make_crops
from ..postprocess.boundary import boundary_sampled_feats
from ..postprocess.clustering import clustering_points, get_clustering_labels
from ..postprocess.fusion import disambiguate_arch_labels, merge_boundary_clusters
from .base import N_SAMPLE, fps_sample
from ..data.scan_prep import prep_scan_host_tgn

K_MAX = 16  # crop slots; challenge jaws have <= 16 teeth


def prep_mesh_tgn(stl_path: str, n_sample: int = N_SAMPLE):
    """Returns (org_feats, bdl_feats, sampled_feats) — original-vertex features
    (post-dedup; the 1-NN output targets), the boundary-resampling source (subdivided
    when the mesh is small), and the 24k FPS sample. The numpy portion lives in
    the JAX-free ``data.scan_prep`` so ``run_many`` worker processes can run it."""
    org_feats, bdl_feats = prep_scan_host_tgn(stl_path, n_sample)
    sampled = fps_sample(bdl_feats, n_sample)
    return org_feats, bdl_feats, sampled.astype(np.float32)


def _pad_centroids(centroids: list[np.ndarray], k_max: int = K_MAX):
    """Host list of centroids → fixed [1, k_max, 3] + validity (largest-first
    truncation when more clusters than slots). Returns (device cents, device
    valid, HOST valid) — the host copy feeds vote aggregation without a
    round-trip fetch."""
    cents = np.full((1, k_max, 3), 1e3, np.float32)
    valid = np.zeros((1, k_max), bool)
    for i, c in enumerate(centroids[:k_max]):
        cents[0, i] = c
        valid[0, i] = True
    return jnp.asarray(cents), jnp.asarray(valid), valid


def _aggregate_crop_votes(sem2: np.ndarray, crop_idx: np.ndarray,
                          crop_valid: np.ndarray, n_points: int) -> np.ndarray:
    """Sum per-crop FG/BG logits onto whole-cloud points
    (inference_pipeline_tgn.py:184-196). Untouched points stay 0 → argmax 0 = BG."""
    votes = np.zeros((n_points, 2), np.float32)
    for k in range(sem2.shape[0]):
        if crop_valid[k]:
            np.add.at(votes, crop_idx[k], sem2[k])
    return np.argmax(votes, axis=1)


class TgnInferencePipeline:
    def __init__(self, fps_ckpt: str, bdl_ckpt: str, config=None,
                 bdl_arch: dict | None = None, n_sample: int = N_SAMPLE,
                 boundary_info: dict | None = None):
        from ..models import get_task
        from ..train.checkpoints import load_weights

        task = get_task("tgnet_fps")
        cfg = config or task.default_config()
        self.crop_size = cfg.model_parameter.get("crop_sample_size", 3072)
        self.n_sample = n_sample
        # boundary_sampling_info defaults (train_configs/tgnet_bdl.py:40-44)
        self.boundary_info = boundary_info or {
            "bdl_ratio": 0.7, "num_of_bdl_points": 20000,
            "num_of_all_points": n_sample}

        self.fps_module = task.build_module(cfg)
        # bdl module arch (train_configs/tgnet_bdl.py model_parameter)
        bdl_arch = bdl_arch or dict(planes=(16, 32), stride=(1, 1),
                                    nsample=(36, 24), blocks=(2, 3), block_num=2)
        self.bdl_module = TGNet(crop_size=self.crop_size, c=6, **bdl_arch)

        key = jax.random.PRNGKey(0)
        feat = jnp.zeros((1, n_sample, 6), jnp.float32)
        labels = jnp.zeros((1, n_sample), jnp.int32)
        init = jax.jit(self.fps_module.init, static_argnames=("train",))
        fps_vars = init(key, feat, None, train=False, labels=labels)
        self.fps_vars = load_weights(fps_ckpt, dict(fps_vars))
        init_b = jax.jit(self.bdl_module.init, static_argnames=("train",))
        bdl_vars = init_b(key, feat, None, train=False, labels=labels)
        self.bdl_vars = load_weights(bdl_ckpt, dict(bdl_vars))

        def stage1(module, variables, feats):
            out = module.apply(variables, feats, None, method=TGNet.stage1)
            # every host consumer takes argmax of the semantics (clustering,
            # crop centroids, final labels) — fetching class ids moves 96 KB
            # through the tunnel instead of the 960 KB logit tensor
            return jnp.argmax(out["sem_1"], -1).astype(jnp.int32), out["offset_1"]

        def stage2(module, variables, feats, cents, valid):
            # crops built IN the same program: a separate make_crops dispatch
            # costs an extra ~25 ms tunnel round trip per stage
            crops, crop_mask, crop_idx, _ = make_crops(
                feats, cents, valid, self.crop_size)
            out = module.apply(variables, crops, crop_mask, method=TGNet.stage2)
            return out["sem_1"], crop_idx[0]  # the crop model's 2-class head

        self._fps_stage1 = jax.jit(
            lambda f: stage1(self.fps_module, self.fps_vars, f))
        self._fps_stage2 = jax.jit(
            lambda f, c, v: stage2(self.fps_module, self.fps_vars, f, c, v))
        self._bdl_stage1 = jax.jit(
            lambda f: stage1(self.bdl_module, self.bdl_vars, f))
        self._bdl_stage2 = jax.jit(
            lambda f, c, v: stage2(self.bdl_module, self.bdl_vars, f, c, v))

        # Per-phase wall time of the LAST COMPLETED __call__, seconds
        # (SURVEY.md §5 tracing/profiling — the reference pipeline has no
        # observability; its known-slow spots are
        # inference_pipeline_tgn.py:26,43). Each __call__ accumulates into its
        # OWN local dict and publishes it here on completion, so concurrent
        # run_many scans cannot interleave phase times into one dict.
        self.timings: dict[str, float] = defaultdict(float)

    @staticmethod
    def _t(timings: dict, name: str, t0: float) -> float:
        now = time.perf_counter()
        timings[name] += now - t0
        return now

    # ------------------------------------------------------------------
    def _run_stage(self, stage1_fn, stage2_fn, feats_np, crop_centroids_from,
                   tag: str, timings: dict):
        """Shared stage runner: forward, host centroids, crops, crop votes."""
        t0 = time.perf_counter()
        feats = jnp.asarray(feats_np[None])
        cls_1, offset_1 = stage1_fn(feats)
        # ONE device_get: each separate np.asarray pays a ~25 ms tunnel RTT
        cls_1, offset_1 = jax.device_get((cls_1[0], offset_1[0]))
        t0 = self._t(timings, f"{tag}:stage1_device", t0)
        xyz = feats_np[:, :3]
        moved = xyz + offset_1
        centroids = crop_centroids_from(cls_1, moved, xyz)
        t0 = self._t(timings, f"{tag}:host_centroids", t0)
        cents, valid, valid_h = _pad_centroids(centroids)
        sem_2, crop_idx_h = jax.device_get(stage2_fn(feats, cents, valid))
        t0 = self._t(timings, f"{tag}:stage2_device", t0)
        whole_mask = _aggregate_crop_votes(
            sem_2, crop_idx_h, valid_h[0], len(feats_np))
        self._t(timings, f"{tag}:host_votes", t0)
        return cls_1, offset_1, moved, whole_mask

    def run_many(self, stl_paths, workers: int = 3, prep_workers: int = 2):
        """Overlapped multi-scan inference: ``workers`` scans in flight so one
        scan's host phases (clustering, boundary resample, fusion) run while
        another's device stages occupy the TPU, and mesh prep (obj parse,
        dedup, normals — the heaviest pure-host phase) is PREFETCHED in
        ``prep_workers`` spawned worker processes: true parallelism past the
        GIL, importing only the JAX-free ``data.scan_prep`` module so workers
        never touch the TPU tunnel. Returns results in input order.

        The reference pipeline is strictly serial per scan
        (inference_pipeline_tgn.py:20-60); this is the TPU-serving analog of
        its batch loop. ``self.timings`` reflects the last COMPLETED scan.
        """
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

        if prep_workers <= 0:
            with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
                return list(ex.map(self, stl_paths))

        ctx = mp.get_context("spawn")  # fork would clone the TPU client state
        with ProcessPoolExecutor(prep_workers, mp_context=ctx) as pp:
            futs = [pp.submit(prep_scan_host_tgn, p, self.n_sample)
                    for p in stl_paths]
            with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
                return list(ex.map(
                    lambda pf: self(pf[0], _prep=pf[1].result()),
                    zip(stl_paths, futs)))

    def __call__(self, stl_path: str, _prep=None) -> dict:
        timings: dict[str, float] = defaultdict(float)
        t0 = time.perf_counter()
        # _prep: optional prefetched (org_feats, bdl_feats) from run_many's
        # worker processes; the device FPS sample always runs here
        org_feats, bdl_feats = _prep or prep_scan_host_tgn(stl_path,
                                                           self.n_sample)
        sampled = fps_sample(bdl_feats, self.n_sample).astype(np.float32)
        n_vertices = org_feats.shape[0]
        t0 = self._t(timings, "mesh_prep", t0)

        # ---------------- stage 1 (fps model) ----------------
        def fps_centroids(cls1, moved, xyz):
            fg_labels = get_clustering_labels(moved, cls1)
            fg_moved = moved[cls1 != 0]
            return [fg_moved[fg_labels == i].mean(axis=0)
                    for i in np.unique(fg_labels)]

        cls_1, offset_1, moved, whole_mask = self._run_stage(
            self._fps_stage1, self._fps_stage2, sampled, fps_centroids, "fps",
            timings)
        t0 = time.perf_counter()  # cls_1: half-arch 0..9

        # refined instancing from the vote-aggregated FG mask (:198-214)
        ins_labels = np.full(len(sampled), -1.0)
        if whole_mask.any():
            fg_ins = get_clustering_labels(moved, whole_mask)
            ins_labels[whole_mask != 0] = fg_ins
        ins_labels = (ins_labels + 1).astype(np.int64)  # 0 = bg
        t0 = self._t(timings, "host_instancing", t0)

        # ---------------- boundary stage (bdl model) ----------------
        bdl_sampled, pseudo_labels, n_bd = boundary_sampled_feats(
            ins_labels, bdl_feats, sampled,
            bdl_ratio=self.boundary_info["bdl_ratio"],
            num_bdl_points=self.boundary_info["num_of_bdl_points"],
            num_all_points=self.boundary_info["num_of_all_points"])
        pseudo_in = pseudo_labels.astype(np.int64) - 1  # -1 = bg
        t0 = self._t(timings, "host_boundary_resample", t0)

        def bdl_centroids(cls_1b, moved_b, xyz_b):
            return [xyz_b[pseudo_in == i].mean(axis=0)
                    for i in np.unique(pseudo_in) if i != -1]

        _, offset_1b, moved_b, whole_mask_b = self._run_stage(
            self._bdl_stage1, self._bdl_stage2, bdl_sampled, bdl_centroids,
            "bdl", timings)
        t0 = time.perf_counter()

        n_clusters = len(np.unique(pseudo_in)) - 1
        bdl_ins = np.zeros(len(bdl_sampled)) - 1
        fg_b = whole_mask_b != 0
        if fg_b.any() and n_clusters >= 1:
            _, _, labels_ls = clustering_points(
                [moved_b[fg_b]], "kmeans", [n_clusters])
            bdl_ins[fg_b] = labels_ls[0]
        bdl_ins = (bdl_ins + 1).astype(np.int64)
        t0 = self._t(timings, "host_bdl_kmeans", t0)

        # ---------------- fusion ----------------
        first_xyz = sampled[:, :3]
        new_sem = disambiguate_arch_labels(first_xyz, ins_labels, cls_1)
        bdl_xyz = bdl_sampled[:n_bd, :3]
        bdl_ps = bdl_ins[:n_bd]
        mod_ps, mod_sem = merge_boundary_clusters(
            first_xyz, ins_labels, new_sem, bdl_xyz, bdl_ps)

        final_points = np.concatenate([first_xyz, bdl_xyz], axis=0)
        final_ins = np.concatenate([ins_labels, mod_ps], axis=0)
        final_sem = np.concatenate([new_sem, mod_sem], axis=0)
        t0 = self._t(timings, "host_fusion", t0)

        # ---------------- 1-NN transfer + FDI remap ----------------
        # host KD-tree: measured 70 ms vs 143 ms for the device MXU variant at
        # [100k x 48k] — 3D trees prune too well for brute-force distances
        from scipy.spatial import cKDTree

        tree = cKDTree(final_points)
        _, nn = tree.query(org_feats[:, :3], k=1, workers=-1)
        result_ins = final_ins[nn.reshape(-1)]
        result_sem = final_sem[nn.reshape(-1)].copy()
        result_sem[result_sem >= 9] += 2
        result_sem[result_sem > 0] += 10
        self._t(timings, "host_1nn_transfer", t0)
        self.timings = timings
        assert result_sem.shape[0] == n_vertices
        assert result_ins.shape[0] == n_vertices
        return {"sem": result_sem.reshape(-1), "ins": result_ins.reshape(-1)}
