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
from .point_transformer import PointTransformerSeg
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


def _pt_backbone_params(mp: dict) -> dict:
    """model_parameter → PointTransformerSeg kwargs (train_configs/pointtransformer.py
    model_parameter contract)."""
    return dict(
        c=mp.get("input_feat", 6),
        planes=tuple(mp.get("planes", (32, 64, 128, 256, 512))),
        stride=tuple(mp.get("stride", (1, 4, 4, 4, 4))),
        nsample=tuple(mp.get("nsample", (36, 24, 24, 24, 24))),
        blocks=tuple(mp.get("blocks", (2, 3, 4, 6, 3))),
        block_num=mp.get("block_num", 5),
    )


def _pointtransformer_preset() -> TrainConfig:
    """train_configs/pointtransformer.py: sgd lr 0.1 momentum 0.9 wd 1e-4,
    cosine 40, min_lr 1e-5; CE only (the wrapper computes but does NOT add the CBL
    losses, transformer_model.py:6-42)."""
    return TrainConfig(
        model_name="pointtransformer",
        optimizer=OptimizerConfig(name="sgd", lr=1e-1, weight_decay=1e-4,
                                  momentum=0.9),
        scheduler=SchedulerConfig(sched="cosine", full_steps=40, min_lr=1e-5),
        loss_weights={"tooth_class_loss_1": 1.0},
        model_parameter={
            "input_feat": 6,
            "stride": [1, 4, 4, 4, 4],
            "nsample": [36, 24, 24, 24, 24],
            "blocks": [2, 3, 4, 6, 3],
            "block_num": 5,
            "planes": [32, 64, 128, 256, 512],
            "crop_sample_size": 3072,
        },
    )


register_task(ModelTask(
    name="pointtransformer",
    build_module=lambda cfg: PointTransformerSeg(
        k=17, **_pt_backbone_params(cfg.model_parameter)),
    compute_losses=_ce_losses,
    default_config=_pointtransformer_preset,
))


# ---------------------------------------------------------------------------
# tgnet (FPS stage): two-stage grouping network (train_configs/tgnet_fps.py)
# ---------------------------------------------------------------------------

def _tgnet_losses(outputs, batch, config: TrainConfig) -> dict:
    """fps_grouping_network_model.py:6-24 + the cbl additions at :58-59."""
    from ..losses.cbl_loss import cbl_loss
    from ..losses.tgn_loss import (batch_center_offset_loss,
                                   batch_chamfer_distance_loss)
    from .tgnet import binary_crop_labels, half_arch_labels

    gt = batch["gt_seg_label"]
    mask = batch.get("mask")
    xyz = batch["feat"][..., :3]
    stride = tuple(config.model_parameter.get("stride", (1, 4, 4, 4, 4)))
    w = config.loss_weights

    half = half_arch_labels(gt)
    crop_gt = binary_crop_labels(outputs["cluster_gt_seg_label"])

    l1 = tooth_class_loss(outputs["sem_1"], half, 10, mask)
    l2 = tooth_class_loss(outputs["sem_2"], crop_gt, 2, outputs["crop_mask"])
    off_loss, dir_loss = batch_center_offset_loss(outputs["offset_1"], xyz, gt, mask)
    chamf = batch_chamfer_distance_loss(outputs["offset_1"], xyz, gt, mask)
    cbl1 = cbl_loss(outputs["cbl_stages_1"], half, 10, stride)
    cbl2 = cbl_loss(outputs["cbl_stages_2"], crop_gt, 2, stride)

    return {
        "tooth_class_loss_1": (l1, w.get("tooth_class_loss_1", 1.0)),
        "tooth_class_loss_2": (l2, w.get("tooth_class_loss_2", 1.0)),
        "offset_1_loss": (off_loss, w.get("offset_1_loss", 0.03)),
        "offset_1_dir_loss": (dir_loss, w.get("offset_1_dir_loss", 0.03)),
        "chamf_1_loss": (chamf, w.get("chamf_1_loss", 0.15)),
        "cbl_loss_1": (cbl1, w.get("cbl_loss_1", 1.0)),
        "cbl_loss_2": (cbl2, w.get("cbl_loss_2", 1.0)),
    }


def _tgnet_preset(name="tgnet_fps") -> TrainConfig:
    """train_configs/tgnet_fps.py: sgd lr 0.1 mom 0.9 wd 1e-4, cosine 40; loss
    weights cbl 1/1, cls 1/1, offset .03/.03, chamfer .15."""
    return TrainConfig(
        model_name=name,
        optimizer=OptimizerConfig(name="sgd", lr=1e-1, weight_decay=1e-4,
                                  momentum=0.9),
        scheduler=SchedulerConfig(sched="cosine", full_steps=40, min_lr=1e-5),
        loss_weights={
            "cbl_loss_1": 1.0,
            "cbl_loss_2": 1.0,
            "tooth_class_loss_1": 1.0,
            "tooth_class_loss_2": 1.0,
            "offset_1_loss": 0.03,
            "offset_1_dir_loss": 0.03,
            "chamf_1_loss": 0.15,
        },
        model_parameter={
            "input_feat": 6,
            "stride": [1, 4, 4, 4, 4],
            "nsample": [36, 24, 24, 24, 24],
            "blocks": [2, 3, 4, 6, 3],
            "block_num": 5,
            "planes": [32, 64, 128, 256, 512],
            "crop_sample_size": 3072,
        },
    )


def _build_tgnet(cfg: TrainConfig):
    from .tgnet import TGNet

    p = _pt_backbone_params(cfg.model_parameter)
    return TGNet(crop_size=cfg.model_parameter.get("crop_sample_size", 3072), **p)


register_task(ModelTask(
    name="tgnet_fps",
    build_module=_build_tgnet,
    compute_losses=_tgnet_losses,
    default_config=_tgnet_preset,
    forward_kwargs=lambda batch: {"labels": batch["gt_seg_label"]},
))
