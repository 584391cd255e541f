"""Generic semantic-segmentation inference pipeline.

Reference parity: inference_pipeline_sem.py:8-51 — the path used by pointnet,
pointnetpp, dgcnn, and pointtransformer. Mesh prep → one jitted forward → argmax →
FDI remap → 1-NN transfer to all original vertices. Note the reference returns the
same array for both "sem" and "ins" (inference_pipeline_sem.py:48-50).

Serving-path layout (same round-trip discipline as the tgn pipeline): the FPS
sample stays ON DEVICE (``fps_sample_dev``), the forward's argmax runs inside
the jitted program, and the class ids + the sampled cloud's host copy ride ONE
``device_get`` — 3 tunnel round trips fewer per scan than the naive
fetch-logits route (idx fetch, sample re-upload, 1.6 MB logit tensor).
"""

from __future__ import annotations

import numpy as np

from .base import (N_SAMPLE, class_logits_to_fdi, fps_sample_dev, nn_upsample,
                   prep_mesh_feats)


class SemInferencePipeline:
    def __init__(self, forward_fn, n_sample: int = N_SAMPLE):
        """``forward_fn(feats [1, n, 6]) -> cls_pred logits [1, n, 17]``
        (a jitted model apply)."""
        import jax
        import jax.numpy as jnp

        self.forward_fn = forward_fn
        self.n_sample = n_sample
        # argmax INSIDE the program: the host consumes class ids only
        self._fwd_ids = jax.jit(
            lambda f: jnp.argmax(forward_fn(f), axis=-1).astype(jnp.int32))

    def __call__(self, stl_path: str) -> dict:
        import jax

        org_feats, feats = prep_mesh_feats(stl_path, self.n_sample)
        feats_dev = fps_sample_dev(feats, self.n_sample)
        cls_pred, sampled = jax.device_get(
            (self._fwd_ids(feats_dev[None])[0], feats_dev))
        fdi = class_logits_to_fdi(np.asarray(cls_pred))
        sampled = np.asarray(sampled)
        full = nn_upsample(fdi, sampled[:, :3], org_feats[:, :3])
        return {"sem": full.reshape(-1), "ins": full.reshape(-1)}
