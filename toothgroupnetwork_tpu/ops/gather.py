"""Index/gather ops.

TPU-native equivalent of the reference's ``index_points``
(reference: external_libs/pointnet2_utils/pointnet2_utils.py:44-61) and the CUDA
``grouping`` kernel (reference: external_libs/pointops/src/grouping/grouping_cuda_kernel.cu:5-25).
On TPU a gather is just ``jnp.take_along_axis``; its VJP is a deterministic
scatter-add (no atomics needed, unlike the reference's ``atomicAdd`` backward).
"""

from __future__ import annotations

import os

import jax
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
    matmuls and is BIT-EXACT for bf16 sources. Gate: eval + TPU + bf16 +
    per-cloud idx (the kernel indexes within each batch cloud) + enough rows
    to amortize + a small source (N <= 4096, i.e. the batched crop stages:
    the kernel's FLOP cost is rows*N*C — at N=24000 the MXU floor is ~6.7 ms
    vs ~13 ms for XLA's gather, marginal, and the NB=188 unrolled
    block-select bloats compile time). ``TGN_TPU_GATHER=mxu|xla``
    force-overrides.
    """
    b, n, _ = points.shape
    rows = idx.size
    mode = os.environ.get("TGN_TPU_GATHER", "auto")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_mxu = (mode == "mxu" or
               (mode == "auto" and not train and on_tpu
                and points.dtype == jnp.bfloat16
                and rows >= 10 ** 5 and n <= 4096))
    if use_mxu:
        from .pallas.gather_kernel import onehot_gather
        return onehot_gather(points, idx)
    return index_points(points, idx)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighborhood gather: ``[B, N, C]`` + ``[B, S, K]`` -> ``[B, S, K, C]``.

    Same contract as the reference's CUDA grouping op
    (external_libs/pointops/functions/pointops.py:48-76) modulo the dense-batch layout.
    """
    return index_points(points, idx)
