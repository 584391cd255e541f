"""Generic semantic-segmentation inference pipeline.

Reference parity: inference_pipeline_sem.py:8-51 — the path used by pointnet,
pointnetpp, dgcnn, and pointtransformer. Mesh prep → one jitted forward → argmax →
FDI remap → 1-NN transfer to all original vertices. Note the reference returns the
same array for both "sem" and "ins" (inference_pipeline_sem.py:48-50).
"""

from __future__ import annotations

import numpy as np

from .base import class_logits_to_fdi, nn_upsample, prep_mesh


class SemInferencePipeline:
    def __init__(self, forward_fn):
        """``forward_fn(feats [1, 24000, 6]) -> cls_pred logits [1, 24000, 17]``
        (a jitted model apply)."""
        self.forward_fn = forward_fn

    def __call__(self, stl_path: str) -> dict:
        org_feats, sampled_feats = prep_mesh(stl_path)
        logits = np.asarray(self.forward_fn(sampled_feats[None]))
        cls_pred = logits[0].argmax(axis=-1)  # [24000] in 0..16
        fdi = class_logits_to_fdi(cls_pred)
        full = nn_upsample(fdi, sampled_feats[:, :3], org_feats[:, :3])
        return {"sem": full.reshape(-1), "ins": full.reshape(-1)}
