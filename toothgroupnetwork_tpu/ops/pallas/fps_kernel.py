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


def _interpret() -> bool:
    """Interpreter mode off-TPU (Mosaic only compiles for TPU targets) —
    keeps TGN_TPU_KERNELS=pallas functional in the CPU test environment."""
    import jax

    return jax.default_backend() not in ("tpu", "axon")


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

    # seed with the first VALID point (== point 0 for valid-first padding,
    # matching both the jnp path's argmax(valid) seed and the CUDA kernel
    # seeding with the cloud's first point, sampling_cuda_kernel.cu:39)
    start = jnp.min(jnp.where(valid > 0, lane_ids, np_)).astype(jnp.int32)
    out_ref[0, 0] = start
    seed = jnp.sum(jnp.where(lane_ids == start, xyz_ref[:], 0.0), axis=1,
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


def _fps_multicloud_kernel(xyz_ref, valid_ref, out_ref, dist_ref, *, m):
    """All clouds advance together, one per SUBLANE row: xyz_ref [3, B, Np],
    valid_ref [B, Np], out_ref [B, Mpad] (VMEM, built by one-hot accumulation),
    dist_ref [B, Np] scratch. One fori_loop iteration selects the next farthest
    point of EVERY cloud simultaneously — per-cloud-sequential variants pay the
    full per-iteration latency B times."""
    b, np_ = valid_ref.shape
    m_pad = out_ref.shape[1]
    valid = valid_ref[:]
    neg_inf = jnp.float32(-1e30)
    dist_ref[:] = jnp.where(valid > 0, jnp.float32(1e30), neg_inf)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, np_), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (b, m_pad), 1)
    # seed col 0 with each cloud's first VALID index (== 0 for valid-first pads)
    start = jnp.min(jnp.where(valid > 0, lane_ids, np_), axis=1,
                    keepdims=True).astype(jnp.int32)              # [B, 1]
    out_ref[:] = start * (out_lanes == 0).astype(jnp.int32)

    def coords_of(sel):
        onehot = (lane_ids == sel).astype(jnp.float32)     # [B, Np]
        return (jnp.sum(xyz_ref[0] * onehot, axis=1, keepdims=True),
                jnp.sum(xyz_ref[1] * onehot, axis=1, keepdims=True),
                jnp.sum(xyz_ref[2] * onehot, axis=1, keepdims=True))

    def body(i, last):
        lx, ly, lz = last
        d = ((xyz_ref[0] - lx) ** 2 + (xyz_ref[1] - ly) ** 2
             + (xyz_ref[2] - lz) ** 2)                     # [B, Np]
        dist = jnp.minimum(dist_ref[:], jnp.where(valid > 0, d, neg_inf))
        dist_ref[:] = dist
        big = jnp.max(dist, axis=1, keepdims=True)
        winner = dist == big
        nxt = jnp.min(jnp.where(winner, lane_ids, np_), axis=1,
                      keepdims=True).astype(jnp.int32)     # [B, 1]
        out_ref[:] = out_ref[:] + nxt * (out_lanes == i).astype(jnp.int32)
        return coords_of(nxt)

    jax.lax.fori_loop(1, m, body, coords_of(start))


@partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas_multicloud(xyz: jnp.ndarray, n_samples: int,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched FPS with clouds vectorized across sublanes (see kernel docstring).
    xyz [B, N, 3] → int32 [B, n_samples]. Requires valid points stored first."""
    b, n, _ = xyz.shape
    np_ = _round_up(n, _LANE)
    xyz_t = jnp.zeros((3, b, np_), jnp.float32).at[:, :, :n].set(
        jnp.moveaxis(xyz.astype(jnp.float32), -1, 0))
    if mask is None:
        valid = jnp.broadcast_to(
            (jnp.arange(np_) < n).astype(jnp.float32)[None, :], (b, np_))
    else:
        valid = jnp.zeros((b, np_), jnp.float32).at[:, :n].set(
            mask.astype(jnp.float32))

    m_pad = _round_up(n_samples, _LANE)
    out = pl.pallas_call(
        partial(_fps_multicloud_kernel, m=n_samples),
        out_shape=jax.ShapeDtypeStruct((b, m_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, np_), jnp.float32)],
        interpret=_interpret(),
    )(xyz_t, valid)
    return out[:, :n_samples]


@partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas_batched(xyz: jnp.ndarray, n_samples: int,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Multi-cloud FPS: grid over the batch, each program runs one cloud's
    sequential loop with its [3, N] tile VMEM-resident. Beats the XLA batched
    loop for many small clouds (the tgnet crop stage: 16 x 3072)."""
    b, n, _ = xyz.shape
    np_ = _round_up(n, _LANE)
    # coord dim padded 3->4: 3D block slices must align to sublane tiling (4);
    # the zero 4th row contributes nothing to distances
    xyz_t = jnp.zeros((b, 4, np_), jnp.float32).at[:, :3, :n].set(
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2))
    if mask is None:
        valid = jnp.broadcast_to(
            (jnp.arange(np_) < n).astype(jnp.float32)[None, None, :],
            (b, 1, np_))
    else:
        valid = jnp.zeros((b, 1, np_), jnp.float32).at[:, 0, :n].set(
            mask.astype(jnp.float32))

    m_pad = _round_up(n_samples, _LANE)

    def kernel(xyz_ref, valid_ref, out_ref, dist_ref):
        _fps_kernel(xyz_ref.at[0], valid_ref.at[0], out_ref.at[0], dist_ref,
                    m=n_samples)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, 4, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
        interpret=_interpret(),
    )(xyz_t, valid)
    return out[:, 0, :n_samples]


def _fps_folded_kernel(xyz_ref, valid_ref, out_ref, dist_ref, *, m: int,
                       np8: int):
    """Sublane-folded single-cloud FPS: the [N] point axis is folded onto all
    8 VPU sublanes — xyz_ref [24, Np8] (rows 0-7 x, 8-15 y, 16-23 z; element
    i lives at (i // Np8, i % Np8), so the reported ids ARE original indices),
    valid_ref [8, Np8], dist scratch [8, Np8], out_ref [1, Mpad] SMEM.

    The unfolded [3, N]/[1, N] layout uses one sublane of every 8-row VPU
    register, so each of the ~6 passes in the loop body ran at 1/8 width —
    the sequential chain was ~9 us/iteration regardless of N (24000->6000 in
    a tgnet stage-1 TransitionDown = ~54 ms). Folding is EXACT: distances are
    the same arithmetic, the winner is extracted as the minimum global id
    among argmax ties — the same tie order as the unfolded kernel and the
    jnp path."""
    valid = valid_ref[:]                                     # [8, Np8]
    xs, ys, zs = xyz_ref[0:8], xyz_ref[8:16], xyz_ref[16:24]
    neg_inf = jnp.float32(-1e30)
    dist_ref[:] = jnp.where(valid > 0, jnp.float32(1e30), neg_inf)
    gid = (jax.lax.broadcasted_iota(jnp.int32, (8, np8), 1)
           + np8 * jax.lax.broadcasted_iota(jnp.int32, (8, np8), 0))
    big_id = jnp.int32(8 * np8)

    def _amin(a):  # [8, Np8] -> [1, 1] (keepdims reduces are Mosaic-native)
        return jnp.min(jnp.min(a, axis=1, keepdims=True), axis=0,
                       keepdims=True)

    def _amax(a):
        return jnp.max(jnp.max(a, axis=1, keepdims=True), axis=0,
                       keepdims=True)

    start = _amin(jnp.where(valid > 0, gid, big_id)).astype(jnp.int32)
    out_ref[0, 0] = start[0, 0]

    def _asum(a):
        return jnp.sum(jnp.sum(a, axis=1, keepdims=True), axis=0,
                       keepdims=True)

    def coords_of(sel):
        onehot = (gid == sel).astype(jnp.float32)   # exactly one 1 (pads: 0)
        return (_asum(xs * onehot), _asum(ys * onehot), _asum(zs * onehot))

    def body(i, last):
        lx, ly, lz = last
        d = (xs - lx) ** 2 + (ys - ly) ** 2 + (zs - lz) ** 2
        dist = jnp.minimum(dist_ref[:], jnp.where(valid > 0, d, neg_inf))
        dist_ref[:] = dist
        mx = _amax(dist)
        nxt = _amin(jnp.where(dist == mx, gid, big_id)).astype(jnp.int32)
        out_ref[0, i] = nxt[0, 0]
        return coords_of(nxt)

    jax.lax.fori_loop(1, m, body, coords_of(start))


@partial(jax.jit, static_argnames=("n_samples",))
def fps_pallas(xyz: jnp.ndarray, n_samples: int,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Single-cloud FPS: xyz [N, 3] (+ optional [N] validity mask with valid points
    stored first) → int32 [n_samples] indices. Runs the sublane-folded kernel
    (see :func:`_fps_folded_kernel`); ``TGN_TPU_FPS_FOLD=0`` selects the
    legacy [3, N] single-sublane layout."""
    import os

    n = xyz.shape[0]
    if os.environ.get("TGN_TPU_FPS_FOLD", "1") != "0":
        np8 = _round_up(-(-n // 8), _LANE)
        npad = 8 * np8
        flat = jnp.zeros((npad, 3), jnp.float32).at[:n].set(
            xyz.astype(jnp.float32))
        xyz_t = jnp.moveaxis(flat.reshape(8, np8, 3), -1, 0).reshape(24, np8)
        v = (jnp.arange(npad) < n) if mask is None else \
            jnp.zeros((npad,), bool).at[:n].set(mask.astype(bool))
        valid = v.astype(jnp.float32).reshape(8, np8)
        m_pad = _round_up(n_samples, _LANE)
        out = pl.pallas_call(
            partial(_fps_folded_kernel, m=n_samples, np8=np8),
            out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((8, np8), jnp.float32)],
            interpret=_interpret(),
        )(xyz_t, valid)
        return out[0, :n_samples]

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
        interpret=_interpret(),
    )(xyz_t, valid)
    return out[0, :n_samples]
