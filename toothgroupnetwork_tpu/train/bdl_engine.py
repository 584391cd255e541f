"""Boundary-aware resampling data engine for tgnet_bdl training.

TPU-native rebuild of the reference's ``BdlGroupingNetworkModel`` data path
(reference: models/bdl_grouping_netowrk_model.py:13-237): a FROZEN pretrained
tgnet_fps model labels each training scan's 24k cloud (crop-vote FG mask + KMeans
with k = #GT teeth on offset-moved points); the ORIGINAL full-resolution mesh is
relabeled by 40-NN purity against those labels; vertices under the 0.7 purity
threshold are boundary; the training cloud becomes 20000 uniformly-sampled boundary
points + FPS of the rest — cached per case (unaugmented) and re-augmented per epoch
(bdl_grouping_netowrk_model.py:136-191).

Runs as the ``tgnet_bdl`` task's host_stage: replaces the batch's feat/labels before
the jitted train step. When the original obj/json paths are not configured (e.g.
synthetic tests), the preprocessed 24k cloud itself serves as the full-res source.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.spatial import cKDTree

from ..data.mesh_io import load_mesh_arr
from ..data.preprocess import Y_AXIS_MAX, Y_AXIS_MIN, fdi_to_class
from ..postprocess.clustering import clustering_points, first_label_ratio


class BdlDataEngine:
    def __init__(self):
        self._frozen = None  # (stage_fn,) lazy-built from config
        self._stl_map = None
        self._json_map = None
        self.rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    def _ensure_frozen(self, config):
        if self._frozen is not None:
            return self._frozen
        import jax
        import jax.numpy as jnp

        from ..models import get_task
        from ..train.checkpoints import load_weights

        task = get_task("tgnet_fps")
        fps_info = config.model_parameter.get("fps_model_info", {})
        fps_cfg = task.default_config()
        if fps_info.get("model_parameter"):
            fps_cfg.model_parameter.update(fps_info["model_parameter"])
        module = task.build_module(fps_cfg)
        n = config.model_parameter.get("n_points", 24000)
        feat = jnp.zeros((1, n, 6), jnp.float32)
        lab = jnp.zeros((1, n), jnp.int32)
        variables = jax.jit(module.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), feat, None, train=False, labels=lab)
        ckpt = fps_info.get("load_ckpt_path")
        if ckpt:
            variables = load_weights(ckpt, dict(variables))

        @jax.jit
        def forward(feat, labels):
            out = module.apply(variables, feat, None, False, labels=labels)
            return (out["sem_2"], out["nn_crop_indexes"], out["crop_valid"],
                    out["offset_1"])

        self._frozen = forward
        return forward

    def _ensure_paths(self, config):
        if self._stl_map is not None:
            return
        self._stl_map, self._json_map = {}, {}
        info = config.model_parameter.get("boundary_sampling_info", {})
        obj_root = info.get("orginal_data_obj_path")
        json_root = info.get("orginal_data_json_path")
        from glob import glob
        if obj_root and os.path.isdir(obj_root):
            for dirpath, _, _ in list(os.walk(obj_root))[1:]:
                for p in glob(os.path.join(dirpath, "*.obj")):
                    self._stl_map[os.path.basename(p).split(".")[0]] = p
        if json_root and os.path.isdir(json_root):
            for dirpath, _, _ in list(os.walk(json_root))[1:]:
                for p in glob(os.path.join(dirpath, "*.json")):
                    self._json_map[os.path.basename(p).split(".")[0]] = p

    def _load_original(self, base_name: str):
        """Original full-res mesh, fixed-constant normalization, class labels −1
        (bdl_grouping_netowrk_model.py:118-131)."""
        import json

        with open(self._json_map[base_name]) as f:
            meta = json.load(f)
        labels = fdi_to_class(np.asarray(meta["labels"]), meta["jaw"]) - 1
        vertices = load_mesh_arr(self._stl_map[base_name])
        vertices[:, :3] -= vertices[:, :3].mean(axis=0)
        vertices[:, :3] = ((vertices[:, :3] - Y_AXIS_MIN)
                           / (Y_AXIS_MAX - Y_AXIS_MIN)) * 2 - 1
        return vertices.astype(np.float32), labels.astype(np.int32)

    # ------------------------------------------------------------------
    def _stage_labels(self, config, feat: np.ndarray, labels: np.ndarray):
        """Frozen-model pseudo instance labels for one scan
        (bdl_grouping_netowrk_model.py:56-114). Returns [N] labels, −1 = bg."""
        import jax.numpy as jnp

        forward = self._ensure_frozen(config)
        sem_2, crop_idx, crop_valid, offset_1 = forward(
            jnp.asarray(feat[None]), jnp.asarray(labels[None]))
        sem_2 = np.asarray(sem_2)          # [K, S, 2]
        crop_idx = np.asarray(crop_idx[0])  # [K, S]
        crop_valid = np.asarray(crop_valid[0])
        offset_1 = np.asarray(offset_1[0])

        votes = np.zeros((feat.shape[0], 2), np.float32)
        for k in range(sem_2.shape[0]):
            if crop_valid[k]:
                np.add.at(votes, crop_idx[k], sem_2[k])
        whole_mask = np.argmax(votes, axis=1)

        moved = feat[:, :3] + offset_1
        fg = whole_mask == 1
        ins = np.full(feat.shape[0], -1.0)
        n_teeth = len(np.unique(labels)) - 1
        if fg.any() and n_teeth >= 1:
            _, _, lab_ls = clustering_points([moved[fg]], "kmeans", [n_teeth])
            ins[fg] = lab_ls[0]
        return ins

    # ------------------------------------------------------------------
    def __call__(self, state, batch, config) -> dict:
        info = config.model_parameter.get("boundary_sampling_info", {})
        bdl_ratio = info.get("bdl_ratio", 0.7)
        n_bdl = info.get("num_of_bdl_points", 20000)
        n_all = info.get("num_of_all_points", 24000)
        cache_dir = info.get("bdl_cache_path")
        self._ensure_paths(config)

        feats = np.asarray(batch["feat"])
        labels = np.asarray(batch["gt_seg_label"])
        mesh_paths = batch.get("mesh_path") or [None] * feats.shape[0]
        augmenters = batch.get("augmenter") or [None] * feats.shape[0]

        out_feat = np.empty((feats.shape[0], n_all, feats.shape[2]), np.float32)
        out_label = np.empty((feats.shape[0], n_all), np.int32)
        for i in range(feats.shape[0]):
            f, l = self._one_item(config, feats[i], labels[i], mesh_paths[i],
                                  augmenters[i], bdl_ratio, n_bdl, n_all,
                                  cache_dir)
            out_feat[i], out_label[i] = f, l
        return {"feat": out_feat, "gt_seg_label": out_label,
                "mask": np.ones(out_label.shape, bool)}

    def _one_item(self, config, feat, labels, mesh_path, augmenter, bdl_ratio,
                  n_bdl, n_all, cache_dir):
        base_name = None
        if mesh_path:
            parts = os.path.basename(mesh_path).split("_")
            base_name = "_".join(parts[:2])
        cache_path = (os.path.join(cache_dir, f"{base_name}.npy")
                      if cache_dir and base_name else None)

        if cache_path and os.path.exists(cache_path):
            arr = np.load(cache_path)
            sampled_feat, sampled_label = arr[:, :6], arr[:, 6].astype(np.int32)
            if augmenter is not None:
                sampled_feat = augmenter.run(sampled_feat.copy())
            return sampled_feat.astype(np.float32), sampled_label

        # original full-res source (fallback: the preprocessed cloud itself)
        if base_name and base_name in self._stl_map and base_name in self._json_map:
            org_feat, org_label = self._load_original(base_name)
        else:
            org_feat, org_label = feat.copy(), labels.copy()
        if org_feat.shape[0] < n_all:
            return feat[:n_all], labels[:n_all]

        ins = self._stage_labels(config, feat, labels)

        auged = augmenter.run(org_feat.copy()) if augmenter is not None \
            else org_feat.copy()
        tree = cKDTree(feat[:, :3])
        k = min(40, feat.shape[0])
        _, nn40 = tree.query(auged[:, :3], k=k, workers=-1)
        ratio = first_label_ratio(ins[np.atleast_2d(nn40)])
        bd = ratio < bdl_ratio

        def resample(sel_feat, sel_auged, sel_label, n, method):
            if method == "uniformly":
                idx = self.rng.permutation(sel_feat.shape[0])[:n]
            else:
                import jax.numpy as jnp

                from ..ops import farthest_point_sample
                if sel_feat.shape[0] <= n:
                    idx = np.arange(sel_feat.shape[0])
                else:
                    idx = np.asarray(farthest_point_sample(
                        jnp.asarray(sel_auged[:, :3], jnp.float32), n))
            return sel_feat[idx], sel_auged[idx], sel_label[idx]

        bd_f, bd_a, bd_l = resample(org_feat[bd], auged[bd], org_label[bd],
                                    n_bdl, "uniformly")
        need = n_all - bd_f.shape[0]
        nb_f, nb_a, nb_l = resample(org_feat[~bd], auged[~bd], org_label[~bd],
                                    need, "fps")
        # pad if still short (degenerate tiny meshes)
        total = bd_f.shape[0] + nb_f.shape[0]
        if total < n_all:
            reps = self.rng.integers(0, total, n_all - total)
            all_f = np.concatenate([bd_f, nb_f])[list(range(total)) + list(reps)]
            all_a = np.concatenate([bd_a, nb_a])[list(range(total)) + list(reps)]
            all_l = np.concatenate([bd_l, nb_l])[list(range(total)) + list(reps)]
        else:
            all_f = np.concatenate([bd_f, nb_f])
            all_a = np.concatenate([bd_a, nb_a])
            all_l = np.concatenate([bd_l, nb_l])

        if cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.save(cache_path,
                    np.concatenate([all_f, all_l[:, None]], axis=1))
        return all_a.astype(np.float32), all_l.astype(np.int32)
