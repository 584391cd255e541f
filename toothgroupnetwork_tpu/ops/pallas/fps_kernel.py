"""Pallas TPU kernel for farthest point sampling.

The reference's CUDA kernel (external_libs/pointops/src/sampling/
sampling_cuda_kernel.cu:14-129) runs one thread-block per cloud with a
shared-memory argmax tree per iteration. The TPU analog keeps the whole working set
resident in VMEM — xyz as a ``[3, N]`` lane-major tile (N=24000 → 288 KB), the
running min-distance as ``[1, N]`` — and runs the inherently sequential sample loop
as a ``fori_loop`` whose body is pure VPU work: one broadcast subtract/square/add
over ``[3, N]``, a running min, a lane max + first-match index extraction, and a
one-hot masked reduce to fetch the winner's coordinates (Mosaic cannot do unaligned
dynamic lane slices, so gathers become masked reductions). Indices stream to SMEM.

This replaces ~8000 XLA loop iterations of gather+reduce per tgnet forward
(24000→6000→1500→375→93, SURVEY.md §7.3 "FPS is inherently sequential").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(xyz_ref, valid_ref, out_ref, dist_ref, *, m):
    """xyz_ref [3, Np] f32 VMEM; valid_ref [1, Np] f32 (1 valid / 0 pad);
    out_ref [1, Mpad] i32 SMEM; dist_ref [1, Np] f32 VMEM scratch."""
    np_ = xyz_ref.shape[1]
    valid = valid_ref[:]                      # [1, Np]
    neg_inf = jnp.float32(-1e30)
    dist_ref[:] = jnp.where(valid > 0, jnp.float32(1e30), neg_inf)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)

    # seed with point 0 (valid points are stored first, matching the CUDA kernel
    # seeding with the cloud's first point, sampling_cuda_kernel.cu:39)
    out_ref[0, 0] = jnp.int32(0)
    seed = jnp.sum(jnp.where(lane_ids == 0, xyz_ref[:], 0.0), axis=1,
                   keepdims=True)             # [3, 1]

    def body(i, lastc):
        delta = xyz_ref[:] - lastc            # [3, Np]
        d = jnp.sum(delta * delta, axis=0, keepdims=True)  # [1, Np]
        dist = jnp.minimum(dist_ref[:], jnp.where(valid > 0, d, neg_inf))
        dist_ref[:] = dist
        big = jnp.max(dist)
        # first index attaining the max (matches argmax tie-breaking)
        winner = dist == big                  # [1, Np]
        nxt = jnp.min(jnp.where(winner, lane_ids, np_)).astype(jnp.int32)
        out_ref[0, i] = nxt
        onehot = (lane_ids == nxt).astype(jnp.float32)
        return jnp.sum(xyz_ref[:] * onehot, axis=1, keepdims=True)  # [3, 1]

    jax.lax.fori_loop(1, m, body, seed)


@partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas(xyz: jnp.ndarray, n_samples: int,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Single-cloud FPS: xyz [N, 3] (+ optional [N] validity mask with valid points
    stored first) → int32 [n_samples] indices."""
    n = xyz.shape[0]
    np_ = _round_up(n, _LANE)
    xyz_t = jnp.zeros((3, np_), jnp.float32).at[:, :n].set(
        xyz.astype(jnp.float32).T)
    if mask is None:
        valid = (jnp.arange(np_) < n).astype(jnp.float32)[None, :]
    else:
        valid = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
            mask.astype(jnp.float32))

    m_pad = _round_up(n_samples, _LANE)
    out = pl.pallas_call(
        partial(_fps_kernel, m=n_samples),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
    )(xyz_t, valid)
    return out[0, :n_samples]
