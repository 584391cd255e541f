"""Inference pipeline factory.

Reference parity: inference_pipeline_maker.py:3-106 (``make_inference_pipeline``),
minus its config-duplication hazard — pipelines here rebuild the module from the SAME
task presets used in training (the README warns the reference's hard-coded copies must
be kept in sync manually, README.md:167).
"""

from __future__ import annotations

import jax

from ..models import get_task
from ..train.checkpoints import load_weights
from .sem import SemInferencePipeline

SEM_MODELS = ("pointnet", "pointnetpp", "dgcnn", "pointtransformer")


def _load_forward(model_name: str, ckpt_path: str, config=None):
    from ..utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()  # TPU-only persistent XLA cache (warm starts)
    task = get_task(model_name)
    cfg = config or task.default_config()
    module = task.build_module(cfg)
    import jax.numpy as jnp
    import numpy as np

    sample = jnp.zeros((1, 24000, 6), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), sample, None, train=False)
    variables = load_weights(ckpt_path, dict(variables))

    @jax.jit
    def forward(feats):
        out = module.apply(variables, feats, None, False)
        return out["cls_pred"]

    return forward


def make_inference_pipeline(model_name: str, ckpt_paths: list[str], config=None):
    """name → pipeline. tgnet takes two checkpoints (fps + bdl); others take one."""
    if model_name in SEM_MODELS:
        forward = _load_forward(model_name, ckpt_paths[0], config)
        return SemInferencePipeline(forward)
    if model_name == "tgnet":
        from .tgn import TgnInferencePipeline

        return TgnInferencePipeline(ckpt_paths[0], ckpt_paths[1], config)
    if model_name == "tsegnet":
        from .tsegnet import TsegnetInferencePipeline

        return TsegnetInferencePipeline(ckpt_paths[0], config)
    raise ValueError(f"unknown model {model_name!r}")
