"""tsegnet inference pipeline.

Faithful rebuild of the reference's tsegnet pipeline (reference:
inference_pipelines/inference_pipeline_tsegnet.py:9-80): mesh prep → centroid module
(jit) → host DBSCAN(eps=.05, min_samples=3) on moved l3 points with dist < 0.3 →
padded crops with DDF feature → seg module (jit) → per crop, points with
``sigmoid(pd_2) > 0.5`` take the crop's argmax id → FDI remap → 1-NN upsample.
Later crops overwrite earlier ones on overlap (the reference loop does the same).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import DBSCAN

from ..models.tsegnet import TSegNetModule, compute_ddf
from ..ops import index_points, knn_points
from .base import N_SAMPLE, nn_upsample, prep_mesh

K_MAX = 16


class TsegnetInferencePipeline:
    def __init__(self, ckpt_path: str, config=None, n_sample: int = N_SAMPLE,
                 crop_size: int | None = None):
        from ..models import get_task
        from ..train.checkpoints import load_weights
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()  # TPU-only persistent XLA cache (warm starts)
        task = get_task("tsegnet")
        cfg = config or task.default_config()
        self.n_sample = n_sample
        self.crop_size = crop_size or cfg.model_parameter.get(
            "crop_sample_size", 3072)
        self.module = task.build_module(cfg)

        key = jax.random.PRNGKey(0)
        feat = jnp.zeros((1, n_sample, 6), jnp.float32)
        cp = jnp.zeros((1, 8, 3), jnp.float32)
        cv = jnp.ones((1, 8), bool)
        variables = jax.jit(self.module.init, static_argnames=("train",))(
            key, feat, None, train=False, center_points=cp, center_valid=cv)
        self.variables = load_weights(ckpt_path, dict(variables))

        self._centroid = jax.jit(lambda f: self.module.apply(
            self.variables, f, None, method="centroid_forward"))
        self._seg = jax.jit(lambda c, m: self.module.apply(
            self.variables, c, m, method="seg_forward"))
        self._crop = jax.jit(self._build_crops)

    def _build_crops(self, feat, l0_points, centers, valid):
        crop_idx, _ = knn_points(centers, feat[..., :3], self.crop_size,
                                 need_dist=False)
        crop_input = index_points(feat, crop_idx)          # [1,K,S,6]
        crop_l0 = index_points(l0_points, crop_idx)        # [1,K,S,32]
        k = centers.shape[1]
        crop_xyz = crop_input[0, ..., :3]
        ddf = compute_ddf(crop_xyz, centers[0])
        crop_feat = jnp.concatenate([crop_xyz, crop_l0[0], ddf], axis=-1)
        crop_mask = jnp.broadcast_to(valid[0][:, None],
                                     (k, self.crop_size))
        return crop_feat, crop_mask, crop_idx[0]

    def __call__(self, stl_path: str) -> dict:
        org_feats, sampled = prep_mesh(stl_path, self.n_sample)
        feats = jnp.asarray(sampled[None])
        cent = self._centroid(feats)
        l3_xyz = np.asarray(cent["l3_xyz"][0])
        offset = np.asarray(cent["offset_result"][0])
        dist = np.asarray(cent["dist_result"][0, :, 0])

        moved = (l3_xyz + offset)[dist < 0.3]
        centers_list = []
        if moved.shape[0] >= 3:
            labels = DBSCAN(eps=0.05, min_samples=3).fit(moved).labels_
            centers_list = [moved[labels == l].mean(axis=0)
                            for l in np.unique(labels) if l != -1]
        centers = np.full((1, K_MAX, 3), 1e3, np.float32)
        valid = np.zeros((1, K_MAX), bool)
        for i, c in enumerate(centers_list[:K_MAX]):
            centers[0, i] = c
            valid[0, i] = True

        pred_labels = np.zeros(self.n_sample)
        if valid.any():
            crop_feat, crop_mask, crop_idx = self._crop(
                feats, cent["l0_points"], jnp.asarray(centers),
                jnp.asarray(valid))
            pd_1, weight_1, pd_2, id_pred = self._seg(crop_feat, crop_mask)
            pd_2 = np.asarray(jax.nn.sigmoid(pd_2[..., 0]))   # [K,S]
            ids = np.asarray(jnp.argmax(id_pred, axis=-1))    # [K]
            crop_idx = np.asarray(crop_idx)                   # [K,S]
            for k in range(K_MAX):
                if not valid[0, k]:
                    continue
                sel = crop_idx[k][pd_2[k] > 0.5]
                pred_labels[sel] = ids[k]

        pred_labels[pred_labels >= 9] += 2
        pred_labels[pred_labels > 0] += 10
        full = nn_upsample(pred_labels, sampled[:, :3], org_feats[:, :3])
        return {"sem": full.reshape(-1).astype(np.int64),
                "ins": full.reshape(-1).astype(np.int64)}
