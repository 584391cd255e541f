"""Shared neural-net building blocks (flax.linen, channel-last, mask-aware)."""

from .layers import MaskedBatchNorm, PointMLP, masked_max, masked_mean

__all__ = ["MaskedBatchNorm", "PointMLP", "masked_max", "masked_mean"]
