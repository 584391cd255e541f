"""Cell-candidate machinery for super-row neighborhood gathers.

The device-path floor is the per-neighbor row gather: each of the ``N*K``
gathered rows costs a full (8, 128) HBM tile read (~8-sublane read
amplification, measured 60-90 GB/s effective — CLAUDE.md), so the attention
layers and kNN re-scores run at ~1/10 of peak bandwidth. The fix (round-2
verdict item 1): group a spatially-sorted cloud into CELLS of 8 consecutive
points — one cell == one f32 HBM tile — and gather each query cell's
DEDUPLICATED set of candidate cells once as contiguous 8-row "super-rows".
Every byte of a super-row read is then a wanted byte, and the per-query exact
neighbor selection happens against the dense per-cell candidate block (a
one-hot MXU matmul in the Pallas kernel, ops/pallas/cell_select_kernel.py).

This module is the XLA-side prep, shared per stage (like the kNN itself):

  * :func:`spatial_sort_perm` — host 2-level spatial sort (x-slabs, then z)
    giving sorted-position locality (measured: the 36-NN of an 8-query cell
    span ~21 distinct cells mean / 28 p99 on scan-like surfaces, vs ~25/47
    for Morton order),
  * :func:`build_cell_candidates` — dedup each query cell's neighbor cells
    into ``L`` static slots + per-neighbor positions into the candidate
    block (with a dump slot for the <2% overflow when a cell has unusually
    many distinct neighbor cells — those neighbors fall out of the
    aggregation exactly like an approx_max_k candidate miss).

Reference contract being accelerated: the CUDA knnquery+grouping pair
(external_libs/pointops/functions/pointops.py:79-100) feeding vector
attention (models/modules/cbl_point_transformer/blocks.py:31-44).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

CELL = 8  # points per cell == f32 sublane-tile height


def spatial_sort_perm(xyz: np.ndarray, slab: int = 1500) -> np.ndarray:
    """Host 2-level spatial sort: equal-count slabs along the widest axis,
    then sort by the second-widest axis within each slab. Returns the
    permutation (int64 [N]). Cheap (two argsorts) and measured better than
    Morton order for cell locality on scan-like surfaces."""
    xyz = np.asarray(xyz)
    n = xyz.shape[0]
    var = xyz.var(axis=0)
    ax1 = int(np.argmax(var))
    var2 = var.copy()
    var2[ax1] = -1
    ax2 = int(np.argmax(var2))
    o1 = np.argsort(xyz[:, ax1], kind="stable")
    out = []
    for i in range(0, n, slab):
        seg = o1[i:i + slab]
        out.append(seg[np.argsort(xyz[seg, ax2], kind="stable")])
    return np.concatenate(out)


@partial(jax.jit, static_argnames=("n_slots",))
def build_cell_candidates(knn_idx: jnp.ndarray, n_slots: int):
    """Per-query-cell candidate cells + per-neighbor positions.

    Args:
      knn_idx: ``[N, K]`` int32 neighbor indices into the SAME (sorted) cloud;
        ``N`` divisible by 8.
      n_slots: L, the static number of candidate-cell slots per query cell.

    Returns:
      cand: ``[G, L]`` int32 candidate cell ids (G = N/8), ascending, padded
        with the last value (duplicates are harmless — selection goes through
        ``pos``).
      pos: ``[N, K]`` int32 position of each neighbor inside its query cell's
        flattened candidate block (``l*8 + idx%8`` in [0, L*8)), or the dump
        value ``L*8`` when the neighbor's cell overflowed the L slots.
      n_cells: ``[G]`` int32 count of distinct candidate cells (diagnostics /
        overflow monitoring).
    """
    n, k = knn_idx.shape
    g = n // CELL
    l_slots = n_slots

    cid = (knn_idx // CELL).astype(jnp.int32).reshape(g, CELL * k)
    s = jnp.sort(cid, axis=-1)
    first = jnp.concatenate(
        [jnp.ones((g, 1), bool), s[:, 1:] != s[:, :-1]], axis=-1)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1     # [G, 8K]
    n_cells = rank[:, -1] + 1

    # scatter first-occurrences into their rank slot; overflow -> dump row
    target = jnp.where(first & (rank < l_slots), rank, l_slots)
    flat_t = (jnp.arange(g, dtype=jnp.int32)[:, None] * (l_slots + 1) + target
              ).reshape(-1)
    cand_flat = jnp.zeros((g * (l_slots + 1),), jnp.int32).at[flat_t].max(
        s.reshape(-1), mode="drop")
    cand = cand_flat.reshape(g, l_slots + 1)[:, :l_slots]
    # pad empty slots (beyond n_cells) with the row max so rows stay ascending
    slot_ids = jnp.arange(l_slots, dtype=jnp.int32)[None, :]
    row_max = jnp.max(cand, axis=-1, keepdims=True)
    cand = jnp.where(slot_ids < jnp.minimum(n_cells, l_slots)[:, None],
                     cand, row_max)

    # position lookup: l = #candidates < cid  (cand rows ascending)
    cid_nk = (knn_idx // CELL).astype(jnp.int32)                 # [N, K]
    cand_by_q = cand.reshape(g, 1, l_slots)                      # [G, 1, L]
    cid_q = cid_nk.reshape(g, CELL * k, 1)                       # [G, 8K, 1]
    l_pos = jnp.sum((cand_by_q < cid_q).astype(jnp.int32), axis=-1)  # [G, 8K]
    found = jnp.take_along_axis(
        cand, jnp.minimum(l_pos, l_slots - 1), axis=-1
    ).reshape(g, CELL * k) == cid_q[..., 0]
    found &= l_pos < l_slots
    pos = jnp.where(found, l_pos * CELL + (knn_idx.reshape(g, CELL * k)
                                           % CELL), l_slots * CELL)
    return cand, pos.reshape(n, k).astype(jnp.int32), n_cells


def pos_with_self_fallback(pos: jnp.ndarray, l8: int) -> jnp.ndarray:
    """Map dump positions (overflowed candidate cells) to the SELF slot
    (column 0 under ``include_self=True`` kNN — the query's own cell is a
    candidate by construction, so ``pos[:, 0] < l8`` except in pathological
    overflow). The affected <2% of neighbor slots then re-weight the self
    point instead of silently zeroing — the same graceful degradation as an
    approx_max_k candidate miss."""
    return jnp.where(pos < l8, pos, pos[:, :1])


@partial(jax.jit, static_argnames=())
def gather_candidate_blocks(x: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """Gather candidate SUPER-ROWS: ``x [N, C]`` + ``cand [G, L]`` →
    ``[G, L*8, C]``. The source is viewed as ``[N/8, 8*C]`` so each gathered
    row is one full 8-point cell — every byte of the (8, 128) tile read is a
    wanted byte, unlike the per-neighbor row gather."""
    n, c = x.shape
    g, l_slots = cand.shape
    cells = x.reshape(n // CELL, CELL * c)
    blk = jnp.take(cells, cand.reshape(-1), axis=0)              # [G*L, 8C]
    return blk.reshape(g, l_slots * CELL, c)
