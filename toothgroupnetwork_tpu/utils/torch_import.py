"""Torch→flax checkpoint conversion.

The reference releases torch ``state_dict`` checkpoints (``.h5``); for parity
validation we map them onto this framework's flax parameter trees
(SURVEY.md §7.3 "Checkpoint compatibility"). Conversion rules:

  * ``Conv1d(k=1).weight [out, in, 1]`` → Dense kernel ``[in, out]``,
  * ``Linear.weight [out, in]``        → Dense kernel ``[in, out]``,
  * BatchNorm ``weight/bias``          → MaskedBatchNorm ``scale/bias`` params,
    ``running_mean/running_var``       → batch_stats ``mean/var``,
  * LayerNorm ``weight/bias``          → LayerNorm ``scale/bias``.

A model family provides a name map: flax param path → (torch key prefix, kind).
Currently implemented: pointnet (tested against the actual reference torch model).
"""

from __future__ import annotations

import numpy as np


def _dense(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])
    out = {"kernel": (w[..., 0] if w.ndim == 3 else w).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"]),
         "bias": np.asarray(sd[prefix + ".bias"])},
        {"mean": np.asarray(sd[prefix + ".running_mean"]),
         "var": np.asarray(sd[prefix + ".running_var"])},
    )


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _stn(sd, prefix):
    """SpatialTransformer ← reference STN3d/STNkd (pointnet_utils.py:10-85)."""
    params, stats = {}, {}
    mlp_p, mlp_s = {}, {}
    for i in range(3):
        mlp_p[f"dense_{i}"] = _dense(sd, f"{prefix}.conv{i + 1}")
        bn_p, bn_s = _bn(sd, f"{prefix}.bn{i + 1}")
        mlp_p[f"bn_{i}"] = bn_p
        mlp_s[f"bn_{i}"] = bn_s
    params["PointMLP_0"] = mlp_p
    stats["PointMLP_0"] = mlp_s
    params["Dense_0"] = _dense(sd, f"{prefix}.fc1")
    params["LayerNorm_0"] = _ln(sd, f"{prefix}.bn4")
    params["Dense_1"] = _dense(sd, f"{prefix}.fc2")
    params["LayerNorm_1"] = _ln(sd, f"{prefix}.bn5")
    params["Dense_2"] = _dense(sd, f"{prefix}.fc3")
    return params, stats


def _point_mlp(sd, conv_keys, bn_keys):
    params, stats = {}, {}
    for i, (ck, bk) in enumerate(zip(conv_keys, bn_keys)):
        params[f"dense_{i}"] = _dense(sd, ck)
        if bk is not None:
            bn_p, bn_s = _bn(sd, bk)
            params[f"bn_{i}"] = bn_p
            stats[f"bn_{i}"] = bn_s
    return params, stats


def convert_pointnet(state_dict: dict) -> dict:
    """Reference pointnet ``get_model`` state_dict → flax variables for
    :class:`~toothgroupnetwork_tpu.models.pointnet.PointNetSeg`.

    Reference layout (models/modules/pointnet.py + pointnet_utils.py); keys may be
    prefixed ``first_sem_model.`` (the PointFirstModule wrapper) — stripped here.
    """
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("first_sem_model."):] if k.startswith("first_sem_model.") else k] \
            = np.asarray(v)

    params, stats = {}, {}

    feat_p, feat_s = {}, {}
    feat_p["stn"], feat_s["stn"] = _stn(sd, "feat.stn")
    feat_p["fstn"], feat_s["fstn"] = _stn(sd, "feat.fstn")
    for name, conv, bn, last_act in (
        ("mlp1", ["feat.conv1"], ["feat.bn1"], True),
        ("mlp2", ["feat.conv2"], ["feat.bn2"], True),
        ("mlp3", ["feat.conv3"], ["feat.bn3"], False),
    ):
        p, s = _point_mlp(sd, conv, bn)
        feat_p[name], feat_s[name] = p, s
    params["feat"], stats["feat"] = feat_p, feat_s

    head_p, head_s = _point_mlp(sd, ["conv1", "conv2", "conv3"],
                                ["bn1", "bn2", "bn3"])
    params["head"], stats["head"] = head_p, head_s
    params["cls"] = _dense(sd, "conv4")

    return {"params": params, "batch_stats": stats}
