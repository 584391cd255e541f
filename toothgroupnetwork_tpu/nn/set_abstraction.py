"""PointNet++ set-abstraction / feature-propagation layers.

TPU-native rebuild of the reference's ``PointNetSetAbstraction`` /
``PointNetSetAbstractionMsg`` / ``PointNetFeaturePropagation``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:198-352) in channel-last
layout over the ops library. Grouped MLPs are Dense over ``[B, S, K, C]`` (the
reference's Conv2d(k=1) over ``[B, C, K, S]``) with BatchNorm statistics over all of
(B, S, K) — matching BatchNorm2d.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    ball_query,
    farthest_point_sample,
    index_points,
    knn_interpolate,
    sample_and_group_all,
)
from .layers import MaskedBatchNorm


class GroupMLP(nn.Module):
    """Dense+BN+ReLU stack over grouped ``[B, S, K, C]`` tensors.

    Internally flattens to 2D ``[B·S·K, C]`` — 4D tensors with small trailing dims
    tile terribly on TPU (see PointTransformerLayer layout note)."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        flat_mask = None
        if mask is not None:
            flat_mask = jnp.broadcast_to(mask, shape[:-1]).reshape(-1)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, flat_mask, train)
            x = nn.relu(x)
        return x.reshape(shape[:-1] + (x.shape[-1],))


class SetAbstraction(nn.Module):
    """Single-scale SA (pointnet2_utils.py:198-239): FPS → ball-group → shared MLP →
    max-pool over the neighborhood. ``group_all`` collapses to one global group."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points=None, mask=None, train: bool = True):
        """xyz [B,N,3]; points [B,N,D] or None. Returns (new_xyz [B,S,3],
        new_points [B,S,C'], new_mask [B,S])."""
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points, mask)
            gmask = mask[:, None, :] if mask is not None else None
            h = GroupMLP(self.mlp, name="mlp")(grouped, gmask, train)
            if mask is not None:
                h = jnp.where(gmask[..., None], h, -1e30)
            pooled = jnp.max(h, axis=2)
            if mask is not None:
                # fully-masked rows (e.g. padded crop slots) pool to 0, not -1e30
                any_valid = jnp.any(mask, axis=-1)[:, None, None]
                pooled = jnp.where(any_valid, pooled, 0.0)
            return new_xyz, pooled, None
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, mask)
            new_xyz = index_points(xyz, fps_idx)
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz, mask)
            grouped_xyz = index_points(xyz, idx) - new_xyz[..., None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points(points, idx)], axis=-1)
            else:
                grouped = grouped_xyz
            new_mask = (index_points(mask[..., None].astype(jnp.float32), fps_idx)
                        [..., 0] > 0) if mask is not None else None
        gmask = new_mask[..., None] * jnp.ones(grouped.shape[:3], bool) \
            if new_mask is not None else None
        h = GroupMLP(self.mlp, name="mlp")(grouped, gmask, train)
        new_points = jnp.max(h, axis=2)  # max over neighborhood K
        return new_xyz, new_points, new_mask


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA (pointnet2_utils.py:242-299): one FPS, per-radius
    ball-group + MLP + max, concat over scales. Note the reference concatenates
    ``[grouped_points, grouped_xyz_rel]`` in THAT order (pointnet2_utils.py:286)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, points=None, mask=None, train: bool = True):
        fps_idx = farthest_point_sample(xyz, self.npoint, mask)
        new_xyz = index_points(xyz, fps_idx)
        new_mask = (index_points(mask[..., None].astype(jnp.float32), fps_idx)
                    [..., 0] > 0) if mask is not None else None
        outs = []
        for i, (radius, k) in enumerate(zip(self.radius_list, self.nsample_list)):
            idx = ball_query(radius, k, xyz, new_xyz, mask)
            grouped_xyz = index_points(xyz, idx) - new_xyz[..., None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            gmask = new_mask[..., None] * jnp.ones(grouped.shape[:3], bool) \
                if new_mask is not None else None
            h = GroupMLP(self.mlp_list[i], name=f"scale_{i}")(grouped, gmask, train)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), new_mask


class FeaturePropagation(nn.Module):
    """FP upsampling (pointnet2_utils.py:302-352): three-NN inverse-distance
    interpolation (or broadcast when S == 1), skip concat, Dense+BN+ReLU stack."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, mask1=None, mask2=None,
                 train: bool = True):
        """xyz1 [B,N,3] targets; xyz2 [B,S,3] sources carrying points2 [B,S,D]."""
        s = xyz2.shape[1]
        if s == 1:
            interp = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[-1]))
        else:
            interp = knn_interpolate(xyz1, xyz2, points2, 3, mask1, mask2)
        if points1 is not None:
            x = jnp.concatenate([points1, interp], axis=-1)
        else:
            x = interp
        for i, f in enumerate(self.mlp):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, mask1, train)
            x = nn.relu(x)
        return x
