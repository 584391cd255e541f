"""Task definitions: couples each model family to its losses and preset config.

Mirrors the reference's model wrappers + train_configs (SURVEY.md §2.4, §2.6):
  * pointnet / pointnetpp / dgcnn / pointtransformer: 17-way CE only
    (pointnet_model.py:6-12 etc.; adam lr 1e-3 for the pointnet family, sgd lr 0.1
    momentum 0.9 for the transformer family; cosine 40 epochs).
"""

from __future__ import annotations

from ..losses.seg_loss import tooth_class_loss
from ..train.config import OptimizerConfig, SchedulerConfig, TrainConfig
from .dgcnn import DGCNNSeg
from .pointnet import PointNetSeg
from .pointnetpp import PointNetPPSeg
from .registry import ModelTask, register_task


def _ce_losses(outputs, batch, config: TrainConfig) -> dict:
    w = config.loss_weights.get("tooth_class_loss_1", 1.0)
    loss = tooth_class_loss(
        outputs["cls_pred"], batch["gt_seg_label"], 17, batch.get("mask"))
    return {"tooth_class_loss_1": (loss, w)}


def _adam_preset(model_name: str) -> TrainConfig:
    """train_configs/pointnet.py etc.: adam lr 1e-3, wd 1e-4, cosine 40, min_lr 1e-5."""
    return TrainConfig(
        model_name=model_name,
        optimizer=OptimizerConfig(name="adam", lr=1e-3, weight_decay=1e-4),
        scheduler=SchedulerConfig(sched="cosine", full_steps=40, min_lr=1e-5),
        loss_weights={"tooth_class_loss_1": 1.0},
    )


register_task(ModelTask(
    name="pointnet",
    build_module=lambda cfg: PointNetSeg(
        num_classes=17, scale=cfg.model_parameter.get("scale", 2)),
    compute_losses=_ce_losses,
    default_config=lambda: _adam_preset("pointnet"),
))

register_task(ModelTask(
    name="pointnetpp",
    build_module=lambda cfg: PointNetPPSeg(
        num_classes=17, scale=cfg.model_parameter.get("scale", 4)),
    compute_losses=_ce_losses,
    default_config=lambda: _adam_preset("pointnetpp"),
))

register_task(ModelTask(
    name="dgcnn",
    build_module=lambda cfg: DGCNNSeg(
        num_classes=17, k=cfg.model_parameter.get("k", 20)),
    compute_losses=_ce_losses,
    default_config=lambda: _adam_preset("dgcnn"),
))
