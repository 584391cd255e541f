"""Pallas TPU kernels: per-query neighbor selection from dense candidate blocks.

Second half of the super-row gather scheme (ops/cells.py): after the XLA-side
candidate gather has produced one dense ``[L*8, C]`` block per 8-query cell,
these kernels replace the per-neighbor row gather (the device-path floor:
~(8,128)-tile read per gathered row) with an in-VMEM one-hot MXU contraction —
``x_g[q,k] = onehot(pos[q,k]) @ block`` — so HBM only ever moves contiguous
candidate blocks.

Two entry points matching the backbone's hoisting structure
(models/point_transformer/backbone.py): ``cell_select_p`` runs ONCE per stage
(the relative-position gather is shared by every block), ``cell_select_x``
runs per block (the block's features change). Geometry selects in f32 (p_r
feeds the positional MLP); features select in their native dtype.

Mosaic layout notes: everything stays 3D with the lane dim last — the one-hot
is built by a 3D iota compare ([8, K, L8]) and contracted with
``dot_general`` over L8 with the query-row axis as a batch dim; outputs are
``[N, K, C]`` blocks (the caller's flat ``[N*K, C]`` view is a free XLA
reshape). In-kernel shape casts like ``[8, K] -> [8K, 1]`` are unsupported
("infer-vector-layout: unsupported shape cast") and deliberately avoided.

Replaces the gather half of the reference's knnquery+grouping pair
(external_libs/pointops/functions/pointops.py:79-100) for SPATIALLY SORTED
clouds (ops/cells.py:spatial_sort_perm); the caller guarantees ``pos`` has no
dump values (ops/cells.py:pos_with_self_fallback maps overflow to self).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL = 8
_PPAD = 8  # p blocks padded to 8 lanes (Mosaic-friendly minor dim)

# batch-dim contraction: onehot [8, K, L8] x blk [L8, C] -> [8, K, C]
_DOT_KL8 = (((2,), (0,)), ((), ()))


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pad_cells(arrs_cellwise, arrs_rowwise, g, tg):
    n_tiles = -(-g // tg)
    padg = n_tiles * tg - g
    if padg:
        arrs_cellwise = [jnp.pad(a, ((0, padg),) + ((0, 0),) * (a.ndim - 1))
                         for a in arrs_cellwise]
        arrs_rowwise = [jnp.pad(a, ((0, padg * CELL),) + ((0, 0),)
                                * (a.ndim - 1)) for a in arrs_rowwise]
    return arrs_cellwise, arrs_rowwise, n_tiles


def _onehot_blockdiag(pos_ref, tg: int, k: int, l8: int, dtype):
    """[TG*8, K, TG*L8] block-diagonal one-hot over the tile's stacked
    candidate blocks: row (t, q, k) hits column ``t*L8 + pos[t*8+q, k]``.
    Built entirely by 3D iota compares — no shape casts (Mosaic rejects
    them), no per-cell loop; consumed by ONE 3Dx2D MXU contraction."""
    rows = tg * CELL
    cols = tg * l8
    col3 = jax.lax.broadcasted_iota(jnp.int32, (rows, k, cols), 2)
    rowcell = jax.lax.broadcasted_iota(jnp.int32, (rows, k, cols), 0) // CELL
    pos3 = pos_ref[:][:, :, None]                              # [TG8, K, 1]
    hit = (col3 // l8 == rowcell) & (col3 % l8 == pos3)
    return hit.astype(dtype)


def _x_kernel(blkx_ref, pos_ref, xg_ref, *, tg: int, k: int, l8: int):
    onehot = _onehot_blockdiag(pos_ref, tg, k, l8, blkx_ref.dtype)
    xg = jax.lax.dot_general(onehot, blkx_ref[:], _DOT_KL8,
                             preferred_element_type=jnp.float32)
    xg_ref[:] = xg.astype(xg_ref.dtype)


@partial(jax.jit, static_argnames=("tile_cells",))
def cell_select_x(blk_x: jnp.ndarray, pos: jnp.ndarray, tile_cells: int = 4):
    """``blk_x [G, L8, C]`` + ``pos [N, K]`` → ``x_g [N, K, C]`` (blk_x dtype),
    bit-equal to ``index_points(x, idx)`` on the sorted cloud."""
    g, l8, c = blk_x.shape
    n, k = pos.shape
    assert n == g * CELL
    tg = tile_cells
    (blk_x,), (pos,), n_tiles = _pad_cells([blk_x], [pos], g, tg)
    blk_flat = blk_x.reshape(-1, c)                   # [G*L8, C] (free)
    xg = pl.pallas_call(
        partial(_x_kernel, tg=tg, k=k, l8=l8),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tg * l8, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg * CELL, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg * CELL, k, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tg * CELL, k, c),
                                       blk_x.dtype),
        interpret=_interpret(),
    )(blk_flat, pos)
    return xg[:n]


def _p_kernel(blkp_ref, pos_ref, pq_ref, pr_ref, *, tg: int, k: int, l8: int):
    onehot = _onehot_blockdiag(pos_ref, tg, k, l8, jnp.float32)
    sel_p = jax.lax.dot_general(onehot, blkp_ref[:], _DOT_KL8,
                                preferred_element_type=jnp.float32)
    pr_ref[:] = sel_p - pq_ref[:][:, None, :]


@partial(jax.jit, static_argnames=("tile_cells",))
def cell_select_p(blk_p: jnp.ndarray, pos: jnp.ndarray, p_q: jnp.ndarray,
                  tile_cells: int = 4):
    """``blk_p [G, L8, 3]`` + ``pos [N, K]`` + ``p_q [N, 3]`` →
    ``p_r [N, K, 3]`` f32: the stage-hoisted relative-position gather
    (``index_points(p, idx) - p[:, None]``)."""
    g, l8, _ = blk_p.shape
    n, k = pos.shape
    assert n == g * CELL
    tg = tile_cells
    blk_p8 = jnp.pad(blk_p.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, _PPAD - 3)))
    pq8 = jnp.pad(p_q.astype(jnp.float32), ((0, 0), (0, _PPAD - 3)))
    (blk_p8,), (pos, pq8), n_tiles = _pad_cells([blk_p8], [pos, pq8], g, tg)
    blk_flat = blk_p8.reshape(-1, _PPAD)              # [G*L8, 8] (free)
    pr = pl.pallas_call(
        partial(_p_kernel, tg=tg, k=k, l8=l8),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tg * l8, _PPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg * CELL, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg * CELL, _PPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg * CELL, k, _PPAD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tg * CELL, k, _PPAD),
                                       jnp.float32),
        interpret=_interpret(),
    )(blk_flat, pos, pq8)
    return pr[:n, :, :3]
