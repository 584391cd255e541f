"""Metric-level A/B of the inference-only approximations (round-4 verdict
next-step 6): train the closed-loop recipe ONCE, then run the full
TgnInferencePipeline on the held-out scan under (a) the all-exact path and
(b) the windowed+approx+bf16 stack forced on (TGN_TPU_KNN=approx,
TGN_TPU_STAGE_KNN=window, TGN_TPU_KNN_SEL=bf16 — the verdict's exact recipe
for exercising the windowed self-kNN on CPU), and report the cal_metric
IoU/F1/SEM_ACC delta.

This is what makes the op-level recall contracts (tests/test_ops.py) mean
something for accuracy: inference sees DIFFERENT neighborhoods than training
did (knn_self_windowed auto-on at N>=2048), and the closed-loop test runs on
CPU where every windowed/approx path is off by default.

Usage: python tools/ab_approx_metric.py  (CPU; ~40-60 min on one core)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from synthetic import class_to_fdi, write_arch_case
    from test_closed_loop import BDL_STEPS, FPS_STEPS, N_PTS, _prep_scan, \
        _train
    from toothgroupnetwork_tpu.eval.metrics import cal_metric
    from toothgroupnetwork_tpu.models import get_task
    from toothgroupnetwork_tpu.models.tgnet import TGNet
    from toothgroupnetwork_tpu.train.checkpoints import save_weights

    import tempfile

    tmp = tempfile.mkdtemp(prefix="ab_approx_")
    task = get_task("tgnet_fps")
    cfg = task.default_config()
    cfg.model_parameter.update({"planes": [16, 32, 64, 64, 64],
                                "blocks": [2, 2, 2, 2, 2],
                                "crop_sample_size": 256})
    scans = [_prep_scan(s) for s in range(6)]
    feats = np.stack([s[0] for s in scans])
    labels = np.stack([s[1] for s in scans]).astype(np.int32) - 1

    fps_module = task.build_module(cfg)
    state, last = _train(fps_module, cfg, task, feats, labels, FPS_STEPS,
                         seed=0)
    print(f"fps trained: tooth_class_loss_1={last['tooth_class_loss_1']:.4f}",
          flush=True)
    fps_ckpt = os.path.join(tmp, "fps.npz")
    save_weights(fps_ckpt, {"params": jax.device_get(state.params),
                            "batch_stats": jax.device_get(state.batch_stats)})

    cfg_bdl = task.default_config()
    cfg_bdl.model_parameter.update({
        "planes": [16, 32], "stride": [1, 1], "nsample": [36, 24],
        "blocks": [2, 3], "block_num": 2, "crop_sample_size": 256})
    bdl_arch = dict(planes=(16, 32), stride=(1, 1), nsample=(36, 24),
                    blocks=(2, 3), block_num=2)
    bdl_module = TGNet(crop_size=256, c=6, **bdl_arch)
    state_b, last_b = _train(bdl_module, cfg_bdl, task, feats, labels,
                             BDL_STEPS, seed=1)
    print(f"bdl trained: tooth_class_loss_1={last_b['tooth_class_loss_1']:.4f}",
          flush=True)
    bdl_ckpt = os.path.join(tmp, "bdl.npz")
    save_weights(bdl_ckpt, {"params": jax.device_get(state_b.params),
                            "batch_stats": jax.device_get(
                                state_b.batch_stats)})

    from toothgroupnetwork_tpu.pipelines.tgn import TgnInferencePipeline

    obj_path, gt_cls = write_arch_case(tmp, seed=99)
    gt_fdi = class_to_fdi(gt_cls)
    boundary_info = {"bdl_ratio": 0.7, "num_of_bdl_points": 1200,
                     "num_of_all_points": N_PTS}

    CONFIGS = {
        "exact": {"TGN_TPU_KNN": "exact", "TGN_TPU_STAGE_KNN": "flat",
                  "TGN_TPU_KNN_SEL": "f32"},
        "approx+window+bf16": {"TGN_TPU_KNN": "approx",
                               "TGN_TPU_STAGE_KNN": "window",
                               "TGN_TPU_KNN_SEL": "bf16"},
    }
    results = {}
    for name, env in CONFIGS.items():
        for k, v in env.items():
            os.environ[k] = v
        cfg_d = task.default_config()
        cfg_d.model_parameter.update(cfg.model_parameter)
        cfg_d.model_parameter["dtype"] = "bfloat16"  # the serving default
        pipe = TgnInferencePipeline(fps_ckpt, bdl_ckpt, cfg_d,
                                    bdl_arch=bdl_arch, n_sample=N_PTS,
                                    boundary_info=boundary_info)
        print(f"[{name}] variants: {pipe.variants()}", flush=True)
        out = pipe(obj_path)
        iou, f1, acc, sem_acc, per = cal_metric(gt_fdi, out["sem"],
                                                out["ins"])
        results[name] = dict(iou=iou, f1=f1, sem_acc=sem_acc,
                             n_inst=len(per))
        print(f"[{name}] IoU={iou:.4f} F1={f1:.4f} SEM_ACC={sem_acc:.4f} "
              f"n_inst={len(per)}", flush=True)

    a, b = results["exact"], results["approx+window+bf16"]
    d_iou = b["iou"] - a["iou"]
    d_f1 = b["f1"] - a["f1"]
    print(f"\nDELTA (approx+window+bf16 − exact): "
          f"IoU {d_iou:+.4f}  F1 {d_f1:+.4f}  "
          f"{'WITHIN' if abs(d_iou) <= 0.005 and abs(d_f1) <= 0.005 else 'OVER'}"
          f" the 0.5 pt bar", flush=True)


if __name__ == "__main__":
    main()
