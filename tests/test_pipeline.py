"""Pipeline + metric tests: cal_metric golden cases, challenge JSON format, and the
full end-to-end slice (synthetic obj -> preprocess -> short train -> inference JSON ->
metric eval) through the CLI entry points."""

import json
import os

import numpy as np
import pytest

from toothgroupnetwork_tpu.eval.metrics import cal_metric
from toothgroupnetwork_tpu.pipelines.base import class_logits_to_fdi, prep_mesh
from toothgroupnetwork_tpu.pipelines.predict import ScanSegmentation

from synthetic import write_synthetic_case, write_synthetic_obj


class TestCalMetric:
    def test_perfect_prediction(self):
        gt = np.array([0, 0, 11, 11, 12, 12, 31, 31])
        iou, f1, acc, sem, arr = cal_metric(gt, gt, gt)
        assert iou == 1.0 and f1 == 1.0 and acc == 1.0 and sem == 1.0
        assert len(arr) == 3  # three non-zero instances

    def test_constructed_half_overlap(self):
        # one instance covering half of a GT tooth
        gt = np.array([11] * 4 + [0] * 4)
        ins = np.array([5, 5, 0, 0, 0, 0, 0, 0])  # covers 2 of 4 gt=11 points
        sem = np.where(ins > 0, 11, 0)
        iou, f1, acc, sem_acc, _ = cal_metric(gt, sem, ins)
        # TP=2, FN=2, FP=0 -> IoU=0.5, precision=1, recall=.5 -> F1=2/3
        assert iou == pytest.approx(0.5)
        assert f1 == pytest.approx(2 / 3)
        assert sem_acc == 1.0

    def test_background_instance_excluded(self):
        gt = np.array([0, 0, 11, 11])
        pred = np.array([0, 0, 11, 11])
        iou, *_ = cal_metric(gt, pred, pred)
        assert iou == 1.0  # only instance 11 counted

    def test_half_arch_tolerance(self):
        gt = np.array([19, 19, 0, 0])  # gt label = sem + 8
        sem = np.array([11, 11, 0, 0])
        ins = np.array([1, 1, 0, 0])
        _, _, _, sem_acc_strict, _ = cal_metric(gt, sem, ins, is_half=False)
        _, _, _, sem_acc_half, _ = cal_metric(gt, sem, ins, is_half=True)
        assert sem_acc_strict == 0.0 and sem_acc_half == 1.0


class TestFdiRemap:
    def test_class_to_fdi_inference_contract(self):
        cls = np.array([0, 1, 8, 9, 16])
        np.testing.assert_array_equal(class_logits_to_fdi(cls),
                                      [0, 11, 18, 21, 28])


class TestJawDetection:
    def test_from_filename(self, tmp_path):
        p = str(tmp_path / "CASE_lower.obj")
        open(p, "w").write("v 0 0 0\n")
        assert ScanSegmentation.get_jaw(p) == "lower"

    def test_from_header(self, tmp_path):
        p = str(tmp_path / "scan.obj")
        open(p, "w").write("# upper\nv 0 0 0\n")
        assert ScanSegmentation.get_jaw(p) == "upper"


class TestPrepMesh:
    def test_scaling_contract(self, tmp_path):
        p = str(tmp_path / "m.obj")
        write_synthetic_obj(p, n_side=20)
        org, sampled = prep_mesh(p)
        assert sampled.shape == (24000, 6)
        # y-extent maps to exactly [-0.8, 1.0]
        assert org[:, 1].min() == pytest.approx(-0.8, abs=1e-5)
        assert org[:, 1].max() == pytest.approx(1.0, abs=1e-5)
        # normals are unit
        np.testing.assert_allclose(np.linalg.norm(org[:, 3:], axis=1), 1.0,
                                   atol=1e-5)


@pytest.mark.slow
class TestEndToEndSlice:
    def test_full_loop_through_cli(self, tmp_path):
        """The round-1 acceptance test (SURVEY.md §7.2 step 3): synthetic case ->
        preprocess CLI -> train CLI (tiny pointnet) -> infer CLI -> evaluate CLI."""
        from toothgroupnetwork_tpu.cli import preprocess as cli_pre
        from toothgroupnetwork_tpu.cli import train as cli_train
        from toothgroupnetwork_tpu.cli import infer as cli_infer
        from toothgroupnetwork_tpu.cli import evaluate as cli_eval

        td = str(tmp_path)
        write_synthetic_case(td, "E2E", "lower", n_side=25, seed=0)
        proc = os.path.join(td, "proc")
        cli_pre.main(["--source_obj_data_path", os.path.join(td, "objs"),
                      "--source_json_data_path", os.path.join(td, "jsons"),
                      "--save_data_path", proc])
        assert os.path.exists(os.path.join(proc, "E2E_lower_lower_sampled_points.npy"))

        # shrink the config for CPU: patch the preset scale via config json
        from toothgroupnetwork_tpu.models import get_task
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        cfg_path = os.path.join(td, "cfg.json")
        cfg.save_json(cfg_path)

        ckpt = os.path.join(td, "ckpts", "pn")
        cli_train.main(["--model_name", "pointnet",
                        "--config_path", cfg_path,
                        "--input_data_dir_path", proc,
                        "--checkpoint_path", ckpt,
                        "--max_epochs", "1"])
        assert os.path.exists(ckpt)

        # export weights for the inference pipeline
        from toothgroupnetwork_tpu.train.checkpoints import (
            restore_train_checkpoint, save_weights)
        from toothgroupnetwork_tpu.train.trainer import Trainer
        from toothgroupnetwork_tpu.data import DentalScanDataset, BatchLoader
        loader = BatchLoader(DentalScanDataset(proc), 1, shuffle=False)
        trainer = Trainer(cfg, task, loader, loader, log_fn=lambda s: None)
        state, _ = restore_train_checkpoint(ckpt, trainer.state)
        weights = os.path.join(td, "pn_weights.npz")
        save_weights(weights, state)

        out_dir = os.path.join(td, "preds")
        cli_infer.main(["--input_dir_path", os.path.join(td, "objs"),
                        "--save_path", out_dir,
                        "--model_name", "pointnet",
                        "--config_path", cfg_path,
                        "--checkpoint_path", weights])
        pred_json = os.path.join(out_dir, "E2E_lower.json")
        assert os.path.exists(pred_json)
        with open(pred_json) as f:
            pred = json.load(f)
        assert pred["jaw"] == "lower"
        n_verts = 25 * 25
        assert len(pred["labels"]) == n_verts
        assert len(pred["instances"]) == n_verts
        labels = np.array(pred["labels"])
        valid_fdi = set(
            [0] + list(range(31, 39)) + list(range(41, 49)))
        assert set(np.unique(labels)).issubset(valid_fdi)

        # evaluate runs end to end (untrained-quality metrics, just the contract)
        gt_json = os.path.join(td, "jsons", "E2E", "E2E_lower.json")
        cli_eval.main(["--gt_json_path", gt_json,
                       "--pred_json_path", pred_json])
