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
    model_parameter contract). Optional "dtype": "bfloat16" switches the backbone
    computation dtype (params/logits stay f32)."""
    import jax.numpy as jnp

    return dict(
        c=mp.get("input_feat", 6),
        planes=tuple(mp.get("planes", (32, 64, 128, 256, 512))),
        stride=tuple(mp.get("stride", (1, 4, 4, 4, 4))),
        nsample=tuple(mp.get("nsample", (36, 24, 24, 24, 24))),
        blocks=tuple(mp.get("blocks", (2, 3, 4, 6, 3))),
        block_num=mp.get("block_num", 5),
        dtype=jnp.dtype(mp.get("dtype", "float32")),
        cell_attention=mp.get("cell_attention", False),
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


# ---------------------------------------------------------------------------
# tgnet_bdl: boundary stage (train_configs/tgnet_bdl.py)
# ---------------------------------------------------------------------------

def _tgnet_bdl_preset() -> TrainConfig:
    """train_configs/tgnet_bdl.py: same optimizer/losses as fps; smaller backbone
    (block_num 2, stride [1,1], planes [16,32]); boundary_sampling_info + frozen
    fps_model_info."""
    cfg = _tgnet_preset("tgnet_bdl")
    cfg.model_parameter = {
        "input_feat": 6,
        "stride": [1, 1],
        "nsample": [36, 24],
        "blocks": [2, 3],
        "block_num": 2,
        "planes": [16, 32],
        "crop_sample_size": 3072,
        "n_points": 24000,
        "boundary_sampling_info": {
            "orginal_data_obj_path": None,
            "orginal_data_json_path": None,
            "bdl_cache_path": None,
            "bdl_ratio": 0.7,
            "num_of_bdl_points": 20000,
            "num_of_all_points": 24000,
        },
        "fps_model_info": {
            "model_parameter": None,  # defaults to the tgnet_fps preset
            "load_ckpt_path": None,   # REQUIRED for real training
        },
    }
    return cfg


# Engines cache a frozen tgnet_fps forward + obj/json path maps, both derived
# from the config — key the cache by that config state so two configs in one
# process (different ckpt or data roots) never share an engine.
_BDL_ENGINES: dict = {}


def _bdl_engine_key(config) -> str:
    mp = config.model_parameter
    return repr((mp.get("fps_model_info"), mp.get("boundary_sampling_info"),
                 mp.get("n_points")))


def _tgnet_bdl_host_stage(state, batch, config):
    key = _bdl_engine_key(config)
    if key not in _BDL_ENGINES:
        from ..train.bdl_engine import BdlDataEngine

        _BDL_ENGINES[key] = BdlDataEngine()
    return _BDL_ENGINES[key](state, batch, config)


register_task(ModelTask(
    name="tgnet_bdl",
    build_module=_build_tgnet,
    compute_losses=_tgnet_losses,
    default_config=_tgnet_bdl_preset,
    forward_kwargs=lambda batch: {"labels": batch["gt_seg_label"]},
    host_stage=_tgnet_bdl_host_stage,
))


# ---------------------------------------------------------------------------
# tsegnet: centroid prediction + crop segmentation (train_configs/tsegnet.py)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

_TSG_JIT_CACHE: dict = {}


def _tsegnet_forward_kwargs(batch: dict) -> dict:
    from .tsegnet import N_CROPS_TRAIN

    cp = batch.get("center_points")
    if cp is None:
        b = batch["feat"].shape[0]
        cp = np.zeros((b, N_CROPS_TRAIN, 3), np.float32)
        cv = np.ones((b, N_CROPS_TRAIN), bool)
    else:
        cv = batch["center_valid"]
    return {"center_points": cp, "center_valid": cv}


def _tsegnet_host_stage(state, batch, config) -> dict:
    """Crop-proposal stage (tsegnet.py:57-71): centroid-module forward (jit) →
    host DBSCAN(eps=.05, min_samples=3) on moved l3 points with dist < 0.3 →
    ≤ 8 random cluster centroids, padded to fixed slots."""
    import jax

    from sklearn.cluster import DBSCAN

    from .tsegnet import N_CROPS_TRAIN

    key = id(state.apply_fn)
    if key not in _TSG_JIT_CACHE:
        def cent_fwd(variables, feat, mask):
            return state.apply_fn(variables, feat, mask,
                                  method="centroid_forward")
        _TSG_JIT_CACHE[key] = jax.jit(cent_fwd)
    out = _TSG_JIT_CACHE[key](
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["feat"], batch.get("mask"))

    l3_xyz = np.asarray(out["l3_xyz"])
    offset = np.asarray(out["offset_result"])
    dist = np.asarray(out["dist_result"])[..., 0]
    rng = np.random.default_rng(int(np.asarray(state.step)))

    b = l3_xyz.shape[0]
    centers = np.full((b, N_CROPS_TRAIN, 3), 1e3, np.float32)
    valid = np.zeros((b, N_CROPS_TRAIN), bool)
    for i in range(b):
        moved = (l3_xyz[i] + offset[i])[dist[i] < 0.3]
        if moved.shape[0] < 3:
            continue
        labels = DBSCAN(eps=0.05, min_samples=3).fit(moved).labels_
        cents = [moved[labels == l].mean(axis=0)
                 for l in np.unique(labels) if l != -1]
        if not cents:
            continue
        cents = np.array(cents)
        sel = rng.permutation(len(cents))[:N_CROPS_TRAIN]
        cents = cents[sel]
        centers[i, :len(cents)] = cents
        valid[i, :len(cents)] = True
    return {"center_points": centers, "center_valid": valid}


def _tsegnet_losses(outputs, batch, config: TrainConfig) -> dict:
    """tsegnet_model.py:14-43 loss assembly: centroid losses (dist 1, cent 1,
    chamfer 0.1) + (when the seg module ran) confidence-weighted seg losses and the
    17-way id loss against nearest-GT-centroid-matched labels."""
    import jax.numpy as jnp

    from ..losses.tsg_loss import (centroid_loss, first_seg_loss, id_loss,
                                   second_seg_loss)
    from ..ops import index_points
    from .tgnet import gt_tooth_centroids

    gt = batch["gt_seg_label"]
    mask = batch.get("mask")
    xyz = batch["feat"][..., :3]
    w = config.loss_weights

    cents, cvalid = gt_tooth_centroids(xyz, gt, mask)  # [B,16,3], [B,16]
    d_loss, c_loss, ch_loss = centroid_loss(
        outputs["offset_result"], outputs["l3_xyz"], outputs["dist_result"],
        cents, cvalid, outputs.get("l3_mask"))
    losses = {
        "dist_loss": (d_loss, w.get("dist_loss", 1.0)),
        "cent_loss": (c_loss, w.get("cent_loss", 1.0)),
        "chamf_loss": (ch_loss, w.get("chamf_loss", 0.1)),
    }
    if "pd_1" not in outputs:
        return losses

    centers = outputs["center_points"]                 # [B,K,3]
    center_valid = outputs["center_valid"]             # [B,K]
    b, k = centers.shape[:2]
    # nearest GT centroid per predicted center → its 1..16 label
    d2 = jnp.sum((centers[:, :, None, :] - cents[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(cvalid[:, None, :], d2, 1e9)
    matched = jnp.argmin(d2, axis=-1) + 1              # [B,K] in 1..16

    crop_idx = outputs["nn_crop_indexes"]              # [B,K,S]
    crop_gt = index_points(gt[..., None].astype(jnp.float32), crop_idx)[..., 0]
    crop_gt = crop_gt.reshape(b * k, -1).astype(jnp.int32)  # [B*K,S], −1..15
    matched_flat = matched.reshape(b * k)
    bin_label = (crop_gt + 1 == matched_flat[:, None]).astype(jnp.int32)

    crop_mask = outputs["crop_mask"]
    seg_1 = first_seg_loss(outputs["pd_1"], outputs["weight_1"], bin_label,
                           crop_mask)
    seg_2 = second_seg_loss(outputs["pd_2"], outputs["weight_1"], bin_label,
                            crop_mask)
    idl = id_loss(outputs["id_pred"], matched_flat,
                  center_valid.reshape(b * k))
    losses.update({
        "seg_1_loss": (seg_1, w.get("seg_1_loss", 1.0)),
        "seg_2_loss": (seg_2, w.get("seg_2_loss", 1.0)),
        "id_pred_loss": (idl, w.get("id_pred_loss", 1.0)),
    })
    return losses


def _tsegnet_preset(name="tsegnet") -> TrainConfig:
    """train_configs/tsegnet.py: adam lr 1e-3, wd 1e-4, cosine 40, min_lr 1e-4."""
    return TrainConfig(
        model_name=name,
        optimizer=OptimizerConfig(name="adam", lr=1e-3, weight_decay=1e-4),
        scheduler=SchedulerConfig(sched="cosine", full_steps=40, min_lr=1e-4),
        loss_weights={"dist_loss": 1.0, "cent_loss": 1.0, "chamf_loss": 0.1,
                      "seg_1_loss": 1.0, "seg_2_loss": 1.0, "id_pred_loss": 1.0},
        model_parameter={
            "crop_sample_size": 3072,
            "run_tooth_segmentation_module": True,
            # staged training: path to a centroid-only checkpoint to warm-start
            # (tsegnet_model.py:11-12 strict=False load)
            "pretrained_centroid_model_path": None,
        },
    )


def _build_tsegnet(cfg: TrainConfig):
    from .tsegnet import TSegNetModule

    return TSegNetModule(
        crop_size=cfg.model_parameter.get("crop_sample_size", 3072),
        run_seg_module=cfg.model_parameter.get(
            "run_tooth_segmentation_module", True),
        tiny_backbone=cfg.model_parameter.get("tiny_backbone", False))


register_task(ModelTask(
    name="tsegnet",
    build_module=_build_tsegnet,
    compute_losses=_tsegnet_losses,
    default_config=_tsegnet_preset,
    forward_kwargs=_tsegnet_forward_kwargs,
    host_stage=_tsegnet_host_stage,
))
