"""Learned-accuracy closed loop (round-2 verdict item 3).

Trains the flagship tgnet_fps model (tiny arch) AND a tiny bdl model on
synthetic labeled arch scans, runs the full two-stage ``TgnInferencePipeline``
with the TRAINED weights on a held-out scan, and asserts ``cal_metric``
IoU/F1 over the reference's metric contract
(reference: eval_visualize_results.py:20-57) — proving the system can
actually segment, not just that the plumbing runs. Also asserts the
bfloat16-vs-float32 inference delta at the cal_metric level (replacing the
argmax-agreement proxy for the bf16 default).

Everything is CPU-sized (2048-point scans, 16/32-plane backbones) but
structurally identical to production: same losses, same pipeline, same
metric. Runtime ~30-40 min on one core — marked slow.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import class_to_fdi, make_synthetic_arch_mesh, write_arch_case

from toothgroupnetwork_tpu.data.mesh_io import compute_vertex_normals
from toothgroupnetwork_tpu.eval.metrics import cal_metric
from toothgroupnetwork_tpu.models import get_task
from toothgroupnetwork_tpu.models.tgnet import TGNet
from toothgroupnetwork_tpu.ops import farthest_point_sample
from toothgroupnetwork_tpu.train.checkpoints import save_weights
from toothgroupnetwork_tpu.train.train_state import create_train_state
from toothgroupnetwork_tpu.train.trainer import make_train_step

N_PTS = 2048
FPS_STEPS = int(os.environ.get("TGN_LOOP_FPS_STEPS", 650))
BDL_STEPS = int(os.environ.get("TGN_LOOP_BDL_STEPS", 150))


def _prep_scan(seed):
    """Training-sample prep mirroring the PIPELINE's per-scan normalization
    (pipelines/base.py: mean-center + y-extent scale) so train and inference
    see the same input distribution."""
    v, f, cls = make_synthetic_arch_mesh(seed=seed)
    v = v - v.mean(0)
    ymin, ymax = v[:, 1].min(), v[:, 1].max()
    v = (v - ymin) / (ymax - ymin) * 1.8 - 0.8
    nrm = compute_vertex_normals(v, f)
    feats = np.concatenate([v, nrm], 1).astype(np.float32)
    idx = np.asarray(farthest_point_sample(
        jnp.asarray(v.astype(np.float32)), N_PTS))
    return feats[idx], cls[idx]


def _train(module, cfg, task, feats, labels, n_steps, seed):
    """adam + cosine(1e-2 → 2e-4): the recipe validated in dev runs — plain
    SGD at constant lr oscillates on the offset heads of this geometry
    (squared-distance offset loss, losses/tgn_loss.py).

    Offset losses upweighted 0.03 → 0.5: at the reference's 0.03 the offset
    head's gradient is ~30x smaller than the CE heads' and it converges to
    offsets WORSE than zero (measured: offset_1_loss 0.08 after 120 steps vs
    the 0.0117 all-zero baseline), which makes DBSCAN merge adjacent teeth
    (round-2 run: 8 instances / IoU 0.689). At 0.5 it reaches 0.005 by step
    80 — teeth collapse into separable clusters (validated 2026-08-18: 11
    instances, f32 IoU 0.861 / F1 0.921 / SEM_ACC 1.0). This is a training-
    recipe choice for the tiny synthetic setup, not a framework change."""
    import math

    from toothgroupnetwork_tpu.train.config import OptimizerConfig

    cfg.optimizer = OptimizerConfig(name="adam", lr=2e-3, weight_decay=1e-4)
    cfg.loss_weights = dict(cfg.loss_weights)
    cfg.loss_weights["offset_1_loss"] = 0.5
    cfg.loss_weights["offset_1_dir_loss"] = 0.5
    batch = {"feat": feats[:2], "gt_seg_label": labels[:2],
             "mask": np.ones((2, N_PTS), bool)}
    state = create_train_state(module, cfg.optimizer, batch,
                               jax.random.PRNGKey(seed),
                               task.forward_kwargs(batch))
    step = jax.jit(make_train_step(task, cfg))
    lr0, lr1 = 1e-2, 2e-4
    for it in range(n_steps):
        sel = np.random.default_rng(seed * 10000 + it).permutation(
            len(feats))[:2]
        b = {"feat": feats[sel], "gt_seg_label": labels[sel],
             "mask": np.ones((2, N_PTS), bool)}
        lr = lr1 + 0.5 * (lr0 - lr1) * (1 + math.cos(math.pi * it / n_steps))
        state = state.set_learning_rate(lr)
        state, vals = step(state, b)
    return state, {k: float(v) for k, v in vals.items()}


@pytest.mark.slow
class TestClosedLoop:
    def test_train_infer_cal_metric(self, tmp_path):
        task = get_task("tgnet_fps")
        cfg = task.default_config()
        cfg.model_parameter.update({"planes": [16, 32, 64, 64, 64],
                                    "blocks": [2, 2, 2, 2, 2],
                                    "crop_sample_size": 256})
        scans = [_prep_scan(s) for s in range(6)]
        feats = np.stack([s[0] for s in scans])
        labels = np.stack([s[1] for s in scans]).astype(np.int32) - 1

        fps_module = task.build_module(cfg)
        state, last = _train(fps_module, cfg, task, feats, labels,
                             FPS_STEPS, seed=0)
        assert last["tooth_class_loss_1"] < 0.15, last
        fps_ckpt = str(tmp_path / "fps.npz")
        save_weights(fps_ckpt, {"params": jax.device_get(state.params),
                                "batch_stats": jax.device_get(
                                    state.batch_stats)})

        cfg_bdl = task.default_config()
        cfg_bdl.model_parameter.update({
            "planes": [16, 32], "stride": [1, 1], "nsample": [36, 24],
            "blocks": [2, 3], "block_num": 2, "crop_sample_size": 256})
        bdl_arch = dict(planes=(16, 32), stride=(1, 1), nsample=(36, 24),
                        blocks=(2, 3), block_num=2)
        bdl_module = TGNet(crop_size=256, c=6, **bdl_arch)
        state_b, last_b = _train(bdl_module, cfg_bdl, task, feats, labels,
                                 BDL_STEPS, seed=1)
        assert last_b["tooth_class_loss_1"] < 0.15, last_b
        bdl_ckpt = str(tmp_path / "bdl.npz")
        save_weights(bdl_ckpt, {"params": jax.device_get(state_b.params),
                                "batch_stats": jax.device_get(
                                    state_b.batch_stats)})

        from toothgroupnetwork_tpu.pipelines.tgn import TgnInferencePipeline

        obj_path, gt_cls = write_arch_case(str(tmp_path), seed=99)
        gt_fdi = class_to_fdi(gt_cls)
        boundary_info = {"bdl_ratio": 0.7, "num_of_bdl_points": 1200,
                         "num_of_all_points": N_PTS}

        metrics = {}
        for dtype in ("float32", "bfloat16"):
            cfg_d = task.default_config()
            cfg_d.model_parameter.update(cfg.model_parameter)
            cfg_d.model_parameter["dtype"] = dtype
            pipe = TgnInferencePipeline(
                fps_ckpt, bdl_ckpt, cfg_d, bdl_arch=bdl_arch,
                n_sample=N_PTS, boundary_info=boundary_info)
            out = pipe(obj_path)
            iou, f1, acc, sem_acc, per = cal_metric(
                gt_fdi, out["sem"], out["ins"])
            metrics[dtype] = dict(iou=iou, f1=f1, acc=acc, sem_acc=sem_acc,
                                  n_inst=len(per))
            print(f"{dtype}: IoU={iou:.3f} F1={f1:.3f} SEM_ACC={sem_acc:.3f} "
                  f"n_inst={len(per)}", flush=True)

        m = metrics["float32"]
        # easy synthetic teeth: the system must actually segment
        assert m["iou"] >= 0.70, metrics
        assert m["f1"] >= 0.75, metrics
        assert m["sem_acc"] >= 0.8, metrics
        assert m["n_inst"] >= 10, metrics
        # bf16 inference must not cost meaningful accuracy (cal_metric level,
        # replacing the round-2 argmax-agreement proxy). Measured on this
        # seeded recipe (2026-08-18): f32 IoU 0.861 / bf16 0.838 — a 2.2 pt
        # delta concentrated in per-instance boundary IoU (SEM_ACC 1.0 both,
        # same 11 instances), i.e. a few flipped boundary vertices on a tiny
        # 120-step model; threshold 0.03 bounds it without flaking on the
        # recipe's sensitivity.
        assert abs(m["iou"] - metrics["bfloat16"]["iou"]) < 0.03, metrics
        assert abs(m["f1"] - metrics["bfloat16"]["f1"]) < 0.03, metrics
