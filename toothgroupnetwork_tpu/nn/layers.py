"""Mask-aware building blocks.

The reference trains torch ``BatchNorm1d`` over ``[B, C, N]`` / ragged ``(n, c)``
tensors at batch 1 — i.e. statistics over the point axis (SURVEY.md §7.3 "BatchNorm at
batch-1"). ``MaskedBatchNorm`` reproduces that with padding excluded from the
statistics, and generalizes it to true batching (stats over all valid points of the
batch, which at B=1 equals the reference's behavior exactly).

All blocks are channel-last ``[..., C]``: a reference ``Conv1d(k=1)`` over ``[B, C, N]``
is a Dense over ``[B, N, C]`` here — same math, MXU-friendly layout.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


def masked_max(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    """Max over ``axis`` with invalid positions excluded. ``mask`` broadcasts against
    ``x``'s shape without the channel dim."""
    if mask is None:
        return jnp.max(x, axis=axis)
    neg = jnp.asarray(-1e30, dtype=x.dtype)
    x = jnp.where(mask[..., None], x, neg)
    return jnp.max(x, axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    w = mask[..., None].astype(x.dtype)
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1.0)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with a validity mask.

    Matches torch ``BatchNorm1d`` semantics: momentum 0.1 (running = 0.9*running +
    0.1*batch), eps 1e-5, biased batch variance for normalization, unbiased for the
    running estimate.
    """

    momentum: float = 0.9
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                red = tuple(range(x.ndim - 1))
                n = jnp.asarray(x.size // c, jnp.float32)
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean((xf - mean) ** 2, axis=red)
            else:
                w = mask[..., None].astype(jnp.float32)
                red = tuple(range(x.ndim - 1))
                n_raw = jnp.sum(w)
                n = jnp.maximum(n_raw, 1.0)
                mean = jnp.sum(xf * w, axis=red) / n
                var = jnp.sum(((xf - mean) ** 2) * w, axis=red) / n
                # Fully-empty mask (e.g. a train batch where the host stage
                # proposed ZERO valid crops in every element): var would be 0
                # and the 1/sqrt(eps) ~ 316x scale explodes a deep stack to
                # inf -> NaN even on rows the loss masks away (NaN*0 = NaN).
                # Fall back to identity stats and keep the running estimates.
                empty = n_raw < 0.5
                var = jnp.where(empty, 1.0, var)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                new_mean = (self.momentum * ra_mean.value
                            + (1 - self.momentum) * mean)
                new_var = (self.momentum * ra_var.value
                           + (1 - self.momentum) * unbiased)
                if mask is not None:
                    new_mean = jnp.where(empty, ra_mean.value, new_mean)
                    new_var = jnp.where(empty, ra_var.value, new_var)
                ra_mean.value = new_mean
                ra_var.value = new_var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class PointMLP(nn.Module):
    """Stack of per-point Dense → MaskedBatchNorm → ReLU (the reference's shared-MLP
    ``Conv1d(k=1)+BN1d+ReLU`` idiom). ``last_activation=False`` leaves the final layer
    linear+BN (PointNetEncoder conv3 style) or fully linear with ``last_norm=False``."""

    features: Sequence[int]
    last_activation: bool = True
    last_norm: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            x = nn.Dense(f, name=f"dense_{i}")(x)
            if not last or self.last_norm:
                x = MaskedBatchNorm(name=f"bn_{i}")(x, mask, train)
            if not last or self.last_activation:
                x = nn.relu(x)
        return x
