"""Index/gather ops.

TPU-native equivalent of the reference's ``index_points``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:44-61) and the CUDA
``grouping`` kernel (reference: external_libs/pointops/src/grouping/grouping_cuda_kernel.cu:5-25).
On TPU a gather is just ``jnp.take_along_axis``; its VJP is a deterministic
scatter-add (no atomics needed, unlike the reference's ``atomicAdd`` backward).
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by index.

    Args:
      points: ``[B, N, C]`` (or ``[N, C]``) source array.
      idx: integer indices, ``[B, S]`` / ``[B, S, K]`` (or ``[S]`` / ``[S, K]``
        for unbatched input) into the N axis.

    Returns:
      ``points[..., idx, :]`` with shape ``idx.shape + (C,)``.
    """
    c = points.shape[-1]
    if points.ndim == 2:
        return jnp.take(points, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,))
    # Batched: ONE flat row gather with per-batch index offsets. The batched
    # take_along_axis formulation lowers to a catastrophic gather on TPU
    # (measured 4.7e11 bytes accessed for a [1,24000,36]x32ch gather vs 4.6e9
    # for flat jnp.take — 100x), and per-batch unrolled takes pay ~8x in
    # dispatch (595ms vs 77ms for 16x[2048,24] from [3072,3]).
    b, n = points.shape[0], points.shape[1]
    flat_pts = points.reshape(b * n, c)
    offs = (jnp.arange(b, dtype=jnp.int32) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1))
    flat_idx = (idx.astype(jnp.int32) + offs).reshape(-1)
    return jnp.take(flat_pts, flat_idx, axis=0).reshape(idx.shape + (c,))


def gather_neighbors(points: jnp.ndarray, idx: jnp.ndarray, *,
                     train: bool = True) -> jnp.ndarray:
    """Neighborhood gather ``[B, N, C]`` + ``[B, M, K]`` -> ``[B, M, K, C]``
    that dispatches to the MXU one-hot gather kernel on the inference path.

    XLA's row gather is the serving backbone's floor (~60-90 GB/s effective,
    8-sublane tile read amplification); the Pallas kernel
    (ops/pallas/gather_kernel.py) reformulates it as full-lane-width MXU
    matmuls and is BIT-EXACT for bf16 sources.

    MEASURED NEGATIVE (r5, tools/profile_gather_mxu.py, TPU v5e, chained):
    at the most favorable shape — B16 N3072 C32 M3072 K36, the crop
    attention gather — the kernel is 33.1 ms vs XLA's 18.6 (0.56x): the
    per-neighbor VPU block-select (NB=24 unrolled compares+selects over the
    [TM, NB*C] dot result) costs more than the strided reads it replaces,
    and the MXU dots run far below peak at TM<=256 rows per tile. ``auto``
    therefore NEVER picks the kernel; it stays available as explicit opt-in
    (``TGN_TPU_GATHER=mxu``) for wider-C regimes where the dot amortizes.
    """
    mode = os.environ.get("TGN_TPU_GATHER", "auto")
    if mode == "mxu":
        from .pallas.gather_kernel import onehot_gather
        return onehot_gather(points, idx)
    return index_points(points, idx)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighborhood gather: ``[B, N, C]`` + ``[B, S, K]`` -> ``[B, S, K, C]``.

    Same contract as the reference's CUDA grouping op
    (external_libs/pointops/functions/pointops.py:48-76) modulo the dense-batch layout.
    """
    return index_points(points, idx)
