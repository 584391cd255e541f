"""Fused vector-attention Pallas kernel (inference path).

Fuses the post-gather chain of the point-transformer attention layer
(reference semantics: models/modules/cbl_point_transformer/blocks.py:14-44 —
position MLP, grouped weight MLP, per-neighborhood softmax, weighted sum) into
ONE VMEM-resident kernel. The XLA graph materializes ~10 HBM round trips of
``[B·N·K, C]`` intermediates per layer (pe, w, q_rep, prod, ... ≈ 8 GB accessed
per stage-1 layer); here each row tile makes exactly one trip: read
``kv_g``/``p_r``/``q``, write ``agg``.

Division of labor (deliberate):
  * the kNN gather producing ``kv_g`` stays in XLA — a flat row gather is
    already near its bandwidth floor and its output feeds this kernel once,
  * train-mode BatchNorm needs global batch statistics over all valid rows, so
    the train path keeps the unfused XLA graph; this kernel is the ``train=False``
    specialization with the BN affine factors FOLDED into scale/shift vectors
    (done by the caller, models/point_transformer/backbone.py).

Layout notes (TPU):
  * all per-neighbor tensors run as 2D ``[TR·K, C]`` tiles (lane dim C),
  * the neighborhood softmax and the final sum-over-K use 3D ``[TR, K, cs|C]``
    views — reductions over the second-minor (sublane) axis, which Mosaic
    handles natively; K and cs are small so the temporary lane waste is
    irrelevant,
  * weights enter VMEM whole (biggest is ``W0 [C, C/s]`` = 64 KB at C=512).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, xg_ref, pr_ref, wk_ref, wv_ref, a0_ref, b0_ref,
                 a1_ref, b1_ref, w0_ref, c0_ref, w1_ref, c1_ref, out_ref, *,
                 k: int, c: int, cs: int):
    """One row tile: q [TR, C], x_g [TRK, C], p_r [TRK, 3] -> agg [TR, C].

    The k/v projections run IN-KERNEL on the gathered neighbors (wk/wv packed
    as [C+1, C]: last row is the bias): the HBM gather then moves C channels
    instead of 2C — the gather is the layer's dominant cost (measured ~60-90
    GB/s effective with 8-sublane read amplification), while projecting the
    K-fold duplicated rows costs only MXU FLOPs.

    a0/b0: pe Dense(3,3) + folded BN scale/shift baked in (see fold in wrapper);
    a1/b1: pe Dense(3,C). w0/c0: folded-BN+Dense(C,cs) pair; w1/c1: folded
    BN+Dense(cs,cs). ReLUs between as in blocks.py:20-25.
    """
    tr = q_ref.shape[0]
    trk = tr * k

    p_r = pr_ref[:].astype(jnp.float32)                    # [TRK, 3]
    # pe = Dense(3->C)(relu(scale*(Dense(3->3)(p_r)) + shift))
    pe0 = jnp.dot(p_r, a0_ref[:], preferred_element_type=jnp.float32)
    pe0 = jnp.maximum(pe0 + b0_ref[:], 0.0)
    pe = jnp.dot(pe0, a1_ref[:], preferred_element_type=jnp.float32)
    pe = pe + b1_ref[:]                                    # [TRK, C]

    x_g = xg_ref[:].astype(jnp.float32)                    # [TRK, C]
    k_g = jnp.dot(x_g, wk_ref[:c, :],
                  preferred_element_type=jnp.float32) + wk_ref[c:c + 1, :]
    v_g = jnp.dot(x_g, wv_ref[:c, :],
                  preferred_element_type=jnp.float32) + wv_ref[c:c + 1, :]

    # q broadcast to neighbors: [TR, C] -> [TR, K, C] -> [TRK, C]
    q_rep = jnp.broadcast_to(q_ref[:][:, None, :], (tr, k, c)).reshape(trk, c)

    w = k_g - q_rep + pe                                   # [TRK, C]
    # folded BN0 + ReLU + Dense(C->cs) + folded BN1 + ReLU + Dense(cs->cs)
    w = jnp.maximum(w * w0_ref[0, :c][None, :] + w0_ref[1, :c][None, :], 0.0)
    w = jnp.dot(w, w0_ref[2:2 + c, :cs], preferred_element_type=jnp.float32)
    w = w + c0_ref[:]                                      # [TRK, cs]
    w = jnp.maximum(w * w1_ref[0, :cs][None, :] + w1_ref[1, :cs][None, :], 0.0)
    w = jnp.dot(w, w1_ref[2:2 + cs, :cs], preferred_element_type=jnp.float32)
    w = w + c1_ref[:]                                      # [TRK, cs]

    # softmax over the K neighbors (axis -2 of the 3D view)
    w3 = w.reshape(tr, k, cs)
    w3 = w3 - jnp.max(w3, axis=1, keepdims=True)
    ex = jnp.exp(w3)
    w3 = ex / jnp.sum(ex, axis=1, keepdims=True)           # [TR, K, cs]

    # grouped broadcast cs -> C (channel c uses weight c % cs) and aggregate
    vpe = (v_g + pe).reshape(tr, k, c)
    wf = jnp.concatenate([w3] * (c // cs), axis=-1)        # [TR, K, C]
    out_ref[:] = jnp.sum(vpe * wf, axis=1)                 # [TR, C]


@partial(jax.jit, static_argnames=("k", "tile_rows"))
def fused_vector_attention(q, x_g, p_r, params, *, k: int,
                           tile_rows: int | None = None):
    """q [BN, C] f32; x_g [BN*K, C] gathered neighbor features (any float
    dtype — bf16 halves the dominant HBM read); p_r [BN*K, 3]; params: dict of
    FOLDED weights (see :func:`fold_attention_params` — must include the k/v
    projections as ``wk``/``bk``/``wv``/``bv``). Returns agg [BN, C] f32.
    """
    bn, c = q.shape
    cs = params["w1"].shape[-1]
    if tile_rows is None:
        # Mosaic's scoped-vmem stack is 16 MB and every [TRK, <=128]-lane f32
        # temporary pads its rows to 512 B. Since the in-kernel k/v projection
        # (this entry takes the RAW gather x_g) the live-temp footprint is
        # ~7.1 KB per neighbor-row per 128-lane group (measured: 32.67 MB at
        # tr=128, k=36, c=32 — a VMEM stack OOM). Budget 12 MB of the 16.
        lane_groups = -(-max(c, cs) // 128)
        tile_rows = max(8, min(128,
                               (12 << 20) // (7200 * k * lane_groups)))
        tile_rows -= tile_rows % 8
    tr = min(tile_rows, -(-bn // 8) * 8)   # keep sublane-aligned row tiles
    n_tiles = -(-bn // tr)
    pad = n_tiles * tr - bn
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        x_g = jnp.pad(x_g, ((0, pad * k), (0, 0)))
        p_r = jnp.pad(p_r, ((0, pad * k), (0, 0)))

    wk = jnp.concatenate([params["wk"], params["bk"][None, :]], axis=0)
    wv = jnp.concatenate([params["wv"], params["bv"][None, :]], axis=0)

    # pack the two w-path stages as [2 + C, cs]-ish blocks: row0 scale, row1
    # shift, rows 2.. the dense matrix (keeps the arg list short)
    w0p = jnp.zeros((2 + c, max(cs, c)), jnp.float32)
    w0p = w0p.at[0, :c].set(params["bn0_scale"]).at[1, :c].set(
        params["bn0_shift"]).at[2:, :cs].set(params["w0"])
    w1p = jnp.zeros((2 + cs, cs), jnp.float32)
    w1p = w1p.at[0, :cs].set(params["bn1_scale"]).at[1, :cs].set(
        params["bn1_shift"]).at[2:, :].set(params["w1"])

    out = pl.pallas_call(
        partial(_attn_kernel, k=k, c=c, cs=cs),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr * k, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr * k, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wk packed [C+1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wv packed [C+1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a0 [3,3]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0 [3]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a1 [3,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1 [C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0 packed
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c0 [cs]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1 packed
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c1 [cs]
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tr, c), jnp.float32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(q, x_g, p_r, wk, wv,
      params["a0"], params["b0"][None, :], params["a1"],
      params["b1"][None, :], w0p, params["c0"][None, :], w1p,
      params["c1"][None, :])
    return out[:bn]


def _packed_body(q_ref, k2, v2, pr2_ref, a0_ref, b0_ref, a1_ref,
                 b1_ref, bn0_ref, w0_ref, c0_ref, bn1_ref, w1_ref, c1_ref,
                 sum_ref, bcast_ref, exp_ref, red_ref, out_ref, *, kk: int):
    """Lane-packed tile: every per-neighbor tensor lives as a 2D ``[TR, K*X]``
    slab (k-major, channel-minor lanes) so the VPU runs at full 128-lane width
    and the MLPs become block-diagonal MXU matmuls (built with ``kron`` in the
    wrapper). The naive ``[TR*K, C]`` layout wastes 3/4 of each register at
    C=32 and its 3D softmax view forces Mosaic relayouts — measured 16.3 ms vs
    ~5 ms XLA; this layout exists to beat both.

    Shapes: q [TR, C]; k2/v2 [TR, K*C] f32 VALUES (not refs — the two entry
    kernels below either read them from HBM-fed refs or project them in-kernel
    from the raw gathered features); pr2 [TR, K*3]; block-diagonal weights
    a0 [K3,K3], a1 [K3,KC], w0 [KC,Kcs], w1 [Kcs,Kcs]; bn0 [2, KC] (scale row
    0 / shift row 1), bn1 [2, Kcs]; biases b0 [1,K3], b1/c0/c1 [1, K*X];
    patterns: sum [Kcs, cs], bcast [cs, Kcs], exp [Kcs, KC], red [KC, C].
    """
    f32 = jnp.float32
    q = q_ref[:].astype(f32)                              # [TR, C]
    tr, c = q.shape

    pr2 = pr2_ref[:].astype(f32)                          # [TR, K3]
    pe0 = jnp.dot(pr2, a0_ref[:], preferred_element_type=f32) + b0_ref[:]
    pe0 = jnp.maximum(pe0, 0.0)
    pe2 = jnp.dot(pe0, a1_ref[:], preferred_element_type=f32) + b1_ref[:]

    q2 = jnp.concatenate([q] * kk, axis=1)                # [TR, KC]
    w = k2 - q2 + pe2
    w = jnp.maximum(w * bn0_ref[0:1, :] + bn0_ref[1:2, :], 0.0)
    w = jnp.dot(w, w0_ref[:], preferred_element_type=f32) + c0_ref[:]
    w = jnp.maximum(w * bn1_ref[0:1, :] + bn1_ref[1:2, :], 0.0)
    w = jnp.dot(w, w1_ref[:], preferred_element_type=f32) + c1_ref[:]

    # softmax over K per (row, cs-channel): subtracting the PER-ROW max (a
    # constant along K) is valid and avoids any cross-lane segmented reduce
    w = w - jnp.max(w, axis=1, keepdims=True)
    e = jnp.exp(w)                                        # [TR, Kcs]
    den = jnp.dot(e, sum_ref[:], preferred_element_type=f32)      # [TR, cs]
    denf = jnp.dot(den, bcast_ref[:], preferred_element_type=f32)  # [TR, Kcs]
    wn = e / denf
    wf = jnp.dot(wn, exp_ref[:], preferred_element_type=f32)      # [TR, KC]

    prod = (v2 + pe2) * wf
    out_ref[:] = jnp.dot(prod, red_ref[:], preferred_element_type=f32
                         ).astype(out_ref.dtype)


def _packed_kernel(q_ref, k2_ref, v2_ref, pr2_ref, *rest, kk: int):
    """Entry kernel: k/v pre-projected by XLA (k2/v2 fed from HBM)."""
    f32 = jnp.float32
    _packed_body(q_ref, k2_ref[:].astype(f32), v2_ref[:].astype(f32),
                 pr2_ref, *rest, kk=kk)


def _packed_x_kernel(q_ref, x2_ref, pr2_ref, wkk_ref, bk2_ref, wvk_ref,
                     bv2_ref, *rest, kk: int):
    """Entry kernel: k/v projected IN-KERNEL from the raw gathered features
    ``x2 [TR, K*Cin]`` via block-diagonal ``kron(I_K, W)`` MXU matmuls. Halves
    the layer's HBM traffic vs the pre-projected entry (one [BNK, C] tensor
    materialized by the gather instead of x_g + k_g + v_g: measured the layer
    is TRAFFIC-bound — 32 ms at B16/3072/K36/C32 vs a ~2-4 ms gather+compute
    floor). The kron dot runs in the INPUT dtype (bf16 on the serving path —
    K x FLOP overhead is free on the MXU; f32 in CPU interpret mode where it
    is exact)."""
    f32 = jnp.float32
    x2 = x2_ref[:]
    k2 = jnp.dot(x2, wkk_ref[:], preferred_element_type=f32) + bk2_ref[:]
    v2 = jnp.dot(x2, wvk_ref[:], preferred_element_type=f32) + bv2_ref[:]
    _packed_body(q_ref, k2, v2, pr2_ref, *rest, kk=kk)


def _packed_patterns(params, k: int, c: int, cs: int):
    """Block-diagonal / tiled weight + pattern tensors shared by the two
    packed entries, in the kernel argument order after pr2."""
    f32 = jnp.float32
    eye_k = jnp.eye(k, dtype=f32)
    a0 = jnp.kron(eye_k, params["a0"].astype(f32))            # [K3, K3]
    a1 = jnp.kron(eye_k, params["a1"].astype(f32))            # [K3, KC]
    w0 = jnp.kron(eye_k, params["w0"].astype(f32))            # [KC, Kcs]
    w1 = jnp.kron(eye_k, params["w1"].astype(f32))            # [Kcs, Kcs]
    b0 = jnp.tile(params["b0"].astype(f32), k)[None, :]
    b1 = jnp.tile(params["b1"].astype(f32), k)[None, :]
    c0 = jnp.tile(params["c0"].astype(f32), k)[None, :]
    c1 = jnp.tile(params["c1"].astype(f32), k)[None, :]
    bn0 = jnp.stack([jnp.tile(params["bn0_scale"].astype(f32), k),
                     jnp.tile(params["bn0_shift"].astype(f32), k)])
    bn1 = jnp.stack([jnp.tile(params["bn1_scale"].astype(f32), k),
                     jnp.tile(params["bn1_shift"].astype(f32), k)])
    ones_k = jnp.ones((k, 1), f32)
    sum_p = jnp.kron(ones_k, jnp.eye(cs, dtype=f32))          # [Kcs, cs]
    bcast_p = jnp.kron(ones_k.T, jnp.eye(cs, dtype=f32))      # [cs, Kcs]
    exp_p = jnp.kron(eye_k, jnp.tile(jnp.eye(cs, dtype=f32), (1, c // cs)))
    red_p = jnp.kron(ones_k, jnp.eye(c, dtype=f32))           # [KC, C]
    return (a0, b0, a1, b1, bn0, w0, c0, bn1, w1, c1,
            sum_p, bcast_p, exp_p, red_p)


def _packed_tiles(bn: int, kc: int, tile_rows: int | None, n_extra_mb: float):
    """Row-tile size under a raised Mosaic scoped-vmem budget (r5): v5e has
    128 MB of VMEM and Mosaic's DEFAULT ~16 MB cap left the kernel
    LATENCY-bound — at B16/3072/K36/C32 the old 14 MB heuristic picked TR=128
    → 384 sequential grid steps, each a dependency chain of ~10 small
    matmuls, 22.9 ms measured vs a ~3-5 ms FLOP+traffic floor. Bigger tiles
    amortize the chain; the wrappers pass the matching
    ``CompilerParams(vmem_limit_bytes=...)``. ``TGN_TPU_ATTN_TR`` overrides
    (sweepable); ~6 live [TR, KC] f32 slabs + ``n_extra_mb`` resident
    weights is the budget model."""
    import os

    if tile_rows is None and os.environ.get("TGN_TPU_ATTN_TR"):
        tile_rows = int(os.environ["TGN_TPU_ATTN_TR"])
    if tile_rows is None:
        budget = max(1 << 19, (_SCOPED_MB << 20) - int(n_extra_mb * (1 << 20)))
        tile_rows = max(8, min(_TR_CAP, budget // (6 * 4 * max(kc, 128))))
        tile_rows -= tile_rows % 8
    tr = min(tile_rows, -(-bn // 8) * 8)
    return tr, -(-bn // tr)


# Scoped-VMEM budget (MB) the tile heuristic plans against and the cap on
# auto-picked tile rows. 48 MB / TR<=512 keep the double-buffered grid
# inputs + resident kron weights + live slabs comfortably inside the 128 MB
# v5e VMEM (measured safe at the flagship shapes; TGN_TPU_ATTN_TR sweeps).
_SCOPED_MB = 48
_TR_CAP = 512


def _packed_compiler_params(tr: int, kc: int, kcin: int, n_extra_mb: float):
    """Mosaic vmem limit sized to the tile plan (double-buffered grid inputs
    + residents + ~6 live f32 slabs), clamped to [32, 100] MB."""
    need = (2 * tr * (kc + kcin) * 4            # double-buffered in/out rows
            + int(n_extra_mb * (1 << 20))       # resident weights/patterns
            + 6 * tr * max(kc, 128) * 4)        # live temporaries
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(need * 2, 32 << 20), 100 << 20)))


@partial(jax.jit, static_argnames=("k", "tile_rows"))
def fused_vector_attention_packed(q, k_g, v_g, p_r, params, *, k: int,
                                  tile_rows: int | None = None):
    """Lane-packed fused attention: q [BN, C]; k_g/v_g [BN*K, C] pre-projected
    by XLA; p_r [BN*K, 3]; params as :func:`fold_attention_params`. Returns
    [BN, C]. Prefer :func:`fused_vector_attention_packed_x` (in-kernel k/v
    projection from the raw gather — half the HBM traffic); this entry remains
    for f32-mode shapes whose kron weights would blow the VMEM budget."""
    bn, c = q.shape
    cs = params["w1"].shape[-1]
    kc, k3 = k * c, k * 3
    tr, n_tiles = _packed_tiles(bn, kc, tile_rows, 2.0)
    pad = n_tiles * tr - bn
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        k_g = jnp.pad(k_g, ((0, pad * k), (0, 0)))
        v_g = jnp.pad(v_g, ((0, pad * k), (0, 0)))
        p_r = jnp.pad(p_r, ((0, pad * k), (0, 0)))

    rows = n_tiles * tr
    k2 = k_g.reshape(rows, kc)            # free: k-major, channel-minor
    v2 = v_g.reshape(rows, kc)
    pr2 = p_r.reshape(rows, k3)
    pats = _packed_patterns(params, k, c, cs)

    row_spec = lambda i: (i, 0)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_packed_kernel, kk=k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tr, c), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, kc), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, kc), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k3), row_spec, memory_space=pltpu.VMEM),
        ] + [full] * 14,
        out_specs=pl.BlockSpec((tr, c), row_spec, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.float32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        compiler_params=_packed_compiler_params(tr, kc, 2 * kc, 2.0),
    )(q, k2, v2, pr2, *pats)
    return out[:bn]


@partial(jax.jit, static_argnames=("k", "tile_rows", "out_dtype"))
def fused_vector_attention_packed_x(q, x_g, p_r, params, *, k: int,
                                    tile_rows: int | None = None,
                                    out_dtype=None):
    """Lane-packed fused attention from the RAW gathered features: q [BN, C]
    (any float dtype — cast to f32 in-kernel); x_g [BN*K, Cin] (any float
    dtype — bf16 halves the dominant HBM read/write); p_r [BN*K, 3]; params
    must include the k/v projections (``wk``/``bk``/``wv``/``bv``,
    :func:`fold_attention_params` provides them). Returns [BN, C] in
    ``out_dtype`` (default f32; in-kernel compute is f32 either way — a bf16
    out_dtype only changes the final store, letting a bf16-model caller skip
    the f32->bf16 dtype-hop pass that made the packed BLOCK regress at B1/24k
    in the r4 recheck, 15.2 vs 12.9 ms).

    vs :func:`fused_vector_attention_packed`: the k/v projections run
    IN-KERNEL as ``kron(I_K, W)`` block-diagonal matmuls on the packed
    [TR, K*Cin] slab, so the layer materializes ONE [BNK, C]-class tensor in
    HBM (the gather output) instead of three (x_g + k_g + v_g) — the layer is
    traffic-bound (B16/3072/K36/C32: 32 ms measured vs a ~2-4 ms floor). The
    kron weights are cast to the INPUT dtype: bf16 on the serving path (the
    K x FLOP overhead of the block-diagonal form is free on the MXU; the
    projections already ran in model dtype on the XLA path), f32 in CPU
    interpret mode where the zero-padded dot is exact."""
    bn, c = q.shape
    cin = x_g.shape[-1]
    cs = params["w1"].shape[-1]
    kc, kcin, k3 = k * c, k * cin, k * 3
    wdt = x_g.dtype if x_g.dtype == jnp.bfloat16 else jnp.float32
    # kron k/v weights resident: 2 * KCin*KC * itemsize
    extra_mb = 2 * kcin * kc * (2 if wdt == jnp.bfloat16 else 4) / (1 << 20)
    tr, n_tiles = _packed_tiles(bn, kc, tile_rows, 2.0 + extra_mb)
    pad = n_tiles * tr - bn
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        x_g = jnp.pad(x_g, ((0, pad * k), (0, 0)))
        p_r = jnp.pad(p_r, ((0, pad * k), (0, 0)))

    rows = n_tiles * tr
    x2 = x_g.reshape(rows, kcin)
    pr2 = p_r.reshape(rows, k3)
    pats = _packed_patterns(params, k, c, cs)

    f32 = jnp.float32
    eye_k = jnp.eye(k, dtype=f32)
    wkk = jnp.kron(eye_k, params["wk"].astype(f32)).astype(wdt)  # [KCin, KC]
    wvk = jnp.kron(eye_k, params["wv"].astype(f32)).astype(wdt)
    bk2 = jnp.tile(params["bk"].astype(f32), k)[None, :]
    bv2 = jnp.tile(params["bv"].astype(f32), k)[None, :]

    row_spec = lambda i: (i, 0)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_packed_x_kernel, kk=k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tr, c), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, kcin), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k3), row_spec, memory_space=pltpu.VMEM),
        ] + [full] * 18,
        out_specs=pl.BlockSpec((tr, c), row_spec, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype or jnp.float32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        compiler_params=_packed_compiler_params(tr, kc, kcin, 2.0 + extra_mb),
    )(q, x2, pr2, wkk, bk2, wvk, bv2, *pats)
    return out[:bn]


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Eval-mode BatchNorm as an affine pair (a, b): y = a*x + b."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def fold_attention_params(variables, eps=1e-5):
    """Fold a PointTransformerLayer's eval-mode sub-params for the kernel.

    ``variables``: the layer's param/batch_stats subtree holding linear_p0,
    linear_p_bn, linear_p1, linear_w_bn0, linear_w0, linear_w_bn1, linear_w1
    (names from models/point_transformer/backbone.py).
    """
    p = variables["params"]
    s = variables["batch_stats"]

    a_p, b_p = fold_bn(p["linear_p_bn"]["scale"], p["linear_p_bn"]["bias"],
                       s["linear_p_bn"]["mean"], s["linear_p_bn"]["var"], eps)
    # fold the pe BN into Dense(3,3): relu(a*(xW+b)+b') = relu(x(W*a) + (b*a+b'))
    a0 = p["linear_p0"]["kernel"] * a_p[None, :]
    b0 = p["linear_p0"]["bias"] * a_p + b_p

    kv = {"wk": p["linear_k"]["kernel"], "bk": p["linear_k"]["bias"],
          "wv": p["linear_v"]["kernel"], "bv": p["linear_v"]["bias"]}

    a_w0, b_w0 = fold_bn(p["linear_w_bn0"]["scale"], p["linear_w_bn0"]["bias"],
                         s["linear_w_bn0"]["mean"], s["linear_w_bn0"]["var"],
                         eps)
    a_w1, b_w1 = fold_bn(p["linear_w_bn1"]["scale"], p["linear_w_bn1"]["bias"],
                         s["linear_w_bn1"]["mean"], s["linear_w_bn1"]["var"],
                         eps)
    return {
        "a0": a0, "b0": b0,
        "a1": p["linear_p1"]["kernel"], "b1": p["linear_p1"]["bias"],
        "bn0_scale": a_w0, "bn0_shift": b_w0,
        "w0": p["linear_w0"]["kernel"], "c0": p["linear_w0"]["bias"],
        "bn1_scale": a_w1, "bn1_shift": b_w1,
        "w1": p["linear_w1"]["kernel"], "c1": p["linear_w1"]["bias"],
        **kv,
    }
