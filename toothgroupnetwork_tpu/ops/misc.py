"""Remaining pointops-parity primitives: subtraction and aggregation.

TPU-native equivalents of the reference's CUDA ``subtraction`` and ``aggregation``
kernels (reference: external_libs/pointops/src/subtraction/subtraction_cuda_kernel.cu:5-30
and aggregation/aggregation_cuda_kernel.cu:5-39; exposed at pointops.py:103-161).
Neither is used by the reference's current models (the vector attention assembles the
same math in torch, blocks.py:31-43 — and ours fuses it in
models/point_transformer/backbone.py), but they are part of the pointops API surface
(SURVEY.md §2.1) and exist here for completeness. Gradients come from AD
(deterministic scatter-add, replacing the reference's atomicAdd backwards).
"""

from __future__ import annotations

import jax.numpy as jnp

from .gather import index_points


def subtraction(input1: jnp.ndarray, input2: jnp.ndarray,
                idx: jnp.ndarray) -> jnp.ndarray:
    """``out[..., n, k, c] = input1[..., n, c] − input2[..., idx[n, k], c]``
    (subtraction_cuda_kernel.cu:5-30 contract, dense-batch layout)."""
    return input1[..., :, None, :] - index_points(input2, idx)


def aggregation(input: jnp.ndarray, position: jnp.ndarray, weight: jnp.ndarray,
                idx: jnp.ndarray) -> jnp.ndarray:
    """``out[..., n, c] = Σ_k (input[..., idx[n,k], c] + position[..., n, k, c])
    · weight[..., n, k, c % w_c]`` — fused attention-weighted aggregation with
    channel-shared weights (aggregation_cuda_kernel.cu:5-39 contract)."""
    gathered = index_points(input, idx)            # [..., n, k, c]
    c = gathered.shape[-1]
    w_c = weight.shape[-1]
    reps = c // w_c
    w_full = jnp.tile(weight, (1,) * (weight.ndim - 1) + (reps,))
    return jnp.sum((gathered + position) * w_full, axis=-2)
