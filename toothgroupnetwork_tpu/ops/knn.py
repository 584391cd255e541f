"""k-nearest-neighbor query (exact off-TPU; approximate-candidate on TPU).

TPU-native equivalent of the reference's CUDA ``knnquery`` kernel
(reference: external_libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108; python
wrapper returns sqrt distances, external_libs/pointops/functions/pointops.py:43).

Approximation scope per (backend, flags) — callers needing full exactness
should pass ``TGN_TPU_KNN=exact`` or use the CPU path:
  * CPU / ``TGN_TPU_KNN=exact``: exact candidate set (``lax.top_k``), exact
    distances and order.
  * TPU, ``need_dist=True`` (default): candidate SET from ``lax.approx_max_k``
    for reference axes >= 1024 (per-neighbor recall ~0.95-0.98 at k=36; the
    global nearest is always retained — approx_max_k keeps each reduction
    bin's maximum); the selected candidates are exactly re-scored by direct
    subtraction and re-sorted, so returned distances and ORDER are exact
    within the set.
  * TPU, ``need_dist=False``: same approximate candidate set, and additionally
    the re-score gather is skipped — returned distances are matmul-expansion
    precision and near-exact ties may be misordered. Most flagship call sites
    (attention neighborhoods, crops, TransitionDown, CBL, 1-NN upsample) run
    this mode: they consume the neighbor SET only.

Implementation notes (all perf facts verified with chained timing +
``compiled.cost_analysis()`` — see CLAUDE.md):
  * distances via the MXU matmul expansion, tiled over the query axis,
  * candidate selection: ``lax.approx_max_k`` on TPU (the PartialReduce unit;
    ``lax.top_k`` lowers to a full bitonic sort ~4x slower),
  * batched inputs are handled natively (batched einsum distances + batched
    selection) — vmap over the single-cloud path costs ~7x in constants.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


def _default_impl() -> str:
    return os.environ.get("TGN_TPU_KERNELS", "jnp")


def _use_approx_topk() -> bool:
    """See module docstring. Override with TGN_TPU_KNN=exact|approx."""
    mode = os.environ.get("TGN_TPU_KNN", "auto")
    if mode == "exact":
        return False
    if mode == "approx":
        return True
    return jax.default_backend() in ("tpu", "axon")


def _batched_sqdist(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[B, M, C] x [B, N, C] -> [B, M, N] squared distances (MXU cross term)."""
    cross = jnp.einsum("bmc,bnc->bmn", q, p,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    q2 = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
    p2 = jnp.sum(p.astype(jnp.float32) ** 2, axis=-1)
    return jnp.maximum(q2[:, :, None] - 2.0 * cross + p2[:, None, :], 0.0)


@partial(jax.jit, static_argnames=("k", "chunk", "impl", "include_self",
                                   "need_dist", "sel_bf16"))
def knn_points(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    q_mask: jnp.ndarray | None = None,
    p_mask: jnp.ndarray | None = None,
    *,
    chunk: int = 2048,
    impl: str | None = None,
    include_self: bool = False,
    need_dist: bool = True,
    sel_bf16: bool = False,
):
    """kNN from ``query`` into ``points`` (see module docstring for the
    approximation scope per backend/flags; exact on CPU or TGN_TPU_KNN=exact).

    Args:
      query: ``[M, C]`` or ``[B, M, C]`` query points.
      points: ``[N, C]`` or ``[B, N, C]`` reference points.
      k: neighbors per query (static).
      q_mask / p_mask: optional validity masks. Invalid reference points are never
        returned as neighbors; rows for invalid queries contain arbitrary (but
        in-range) indices.
      chunk: query-axis tile size for the distance blocks.
      include_self: set for SELF-queries (``query is points``): guarantees row ``i``
        contains index ``i`` itself, first (distance 0). The reference CUDA kernel
        returns the query point itself first by construction
        (knnquery_cuda_kernel.cu:65-108); under ``approx_max_k`` candidate
        selection (recall ≈0.95) the self index can otherwise be dropped, which
        would make CBL's "exclude self-loop" slice (losses/cbl_loss.py) silently
        drop a REAL neighbor instead.

      need_dist: set ``False`` when the caller consumes only the neighbor SET
        (attention neighborhoods, crops, TransitionDown, 1-NN head upsample —
        none of them read ``dist``): skips the exact re-score gather
        ([B·M·k, 3] random rows — ~40% of kNN cost at the flagship's shapes) and
        returns distances in matmul-expansion precision instead. The candidate
        set and the ``include_self`` guarantee are unchanged; only the returned
        distances (and the order among near-exact ties) are approximate.

      sel_bf16: opt IN to the bf16 selection matrix (approx + need_dist=False
        paths only; see the in-body comment). Callers pass ``not train`` so the
        cheaper selection applies to INFERENCE traces only — the train-time
        numerics stay f32-selection without a separate equivalence study
        (round-3 advisor item). ``TGN_TPU_KNN_SEL=bf16|f32`` force-overrides
        both ways; the default ``auto`` defers to this flag.

    Returns:
      ``(idx, dist)``: int32 ``[..., M, k]`` neighbor indices (ascending by exact
      distance) and float32 Euclidean distances (sqrt, matching pointops.py:43).
    """
    if impl is None:
        impl = _default_impl()
    if impl == "pallas" and query.ndim == 2:
        from .pallas.knn_kernel import knn_pallas

        return knn_pallas(query, points, k, q_mask, p_mask,
                          include_self=include_self, need_dist=need_dist)

    squeeze = False
    if query.ndim == 2:
        query, points = query[None], points[None]
        q_mask = None if q_mask is None else q_mask[None]
        p_mask = None if p_mask is None else p_mask[None]
        squeeze = True

    b, m, c = query.shape
    n = points.shape[1]
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if p_mask is None:
        invalid_bias = jnp.zeros((b, n), jnp.float32)
    else:
        invalid_bias = jnp.where(p_mask.astype(bool), 0.0, _BIG)

    keff = min(k, n)
    # approx_max_k (PartialReduce) wins down to ~1k-long candidate axes: measured
    # (chained, in-structure) [16,2048,3072] k=36 exact 63.8ms vs approx 10.3ms,
    # [1,6000,6000] k=24 exact 30.9ms vs approx 5.8ms. (A round-1 note claimed
    # approx was pathological at mid sizes — that was a measurement artifact of a
    # giant-carry timing harness; see tools/profile_flagship.py methodology.)
    approx = _use_approx_topk() and n >= 1024 and keff <= 128

    # csize: largest tile <= chunk that minimizes padding waste (e.g. m=3072,
    # chunk=2048 -> two 1536 tiles instead of 2048+1024-of-pad)
    csize = min(chunk, m)
    n_chunks = -(-m // csize)
    csize = -(-m // n_chunks)
    pad = n_chunks * csize - m
    qpad = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    # [n_chunks, B, csize, C]
    qchunks = jnp.moveaxis(qpad.reshape(b, n_chunks, csize, c), 1, 0)
    # global query index per chunk row (self-index for include_self)
    qidx_chunks = jnp.minimum(
        jnp.arange(n_chunks * csize, dtype=jnp.int32), n - 1
    ).reshape(n_chunks, csize)

    # bf16 SELECTION matrix (approx+need_dist=False only): the [csize, N]
    # distance tile is the kNN's traffic, and these call sites consume the
    # candidate SET only — writing/selecting it at half width halves that
    # traffic. Candidate membership under bf16 rounding stays within the
    # accepted approx recall (set-overlap contract-tested); returned distances
    # are already documented selection-precision here. A/B at the purity shape
    # ([104k x 24k] k=40): host_boundary_resample 252 -> 222 ms/scan with
    # pipeline-level parity (the exact nn1 re-score downstream is unaffected —
    # up to bf16 near-ties in candidate MEMBERSHIP: two points whose -d2
    # round to the same bf16 can swap in/out of the candidate set, so the
    # "exact 1-NN" guarantee of re-scoring consumers weakens to
    # exact-within-the-selected-set). SCOPE: inference traces only — callers
    # pass sel_bf16=not train (round-3 advisor: the call sites are shared by
    # train and eval, and only the serving phase was A/B'd). Env force:
    # TGN_TPU_KNN_SEL=bf16|f32 overrides the caller hint both ways.
    env_sel = os.environ.get("TGN_TPU_KNN_SEL", "auto")
    use_bf16 = sel_bf16 if env_sel == "auto" else env_sel == "bf16"
    sel_bf16 = approx and not need_dist and use_bf16

    def one_chunk(args):
        qc, qi = args
        d2 = _batched_sqdist(qc, points) + invalid_bias[:, None, :]
        if approx:
            if sel_bf16:
                vals, idx = jax.lax.approx_max_k(
                    (-d2).astype(jnp.bfloat16), keff, recall_target=0.95)
                vals = vals.astype(jnp.float32)
            else:
                vals, idx = jax.lax.approx_max_k(-d2, keff, recall_target=0.95)
        else:
            vals, idx = jax.lax.top_k(-d2, keff)
        if keff < k:
            # Fewer points than neighbors requested: pad with the cloud's
            # FIRST index at dist2=1e10 — the CUDA knnquery's unfilled-heap
            # semantics (knnquery_cuda_kernel.cu:87-91, heap slots init to
            # {start, 1e10} and sort to the tail). Trained reference
            # checkpoints see exactly this at the deepest crop stage
            # (3072 -> 12 points with nsample=24), so weight-transfer parity
            # requires reproducing it rather than repeating the last real
            # neighbor.
            idx = jnp.concatenate(
                [idx] + [jnp.zeros_like(idx[..., :1])] * (k - keff), axis=-1)
            vals = jnp.concatenate(
                [vals] + [jnp.full_like(vals[..., :1], -1e10)] * (k - keff),
                axis=-1)
        dup = None
        if include_self:
            # Prepend the query's own index as candidate 0 and drop any duplicate
            # of it among the selected: the 0-distance tie then resolves to the
            # self index (lax.top_k breaks ties toward the lower position).
            self_col = jnp.broadcast_to(qi[None, :, None],
                                        (b, qi.shape[0], 1)).astype(idx.dtype)
            dup = idx == self_col
            idx = jnp.concatenate([self_col, idx], axis=-1)

        if need_dist:
            # Exact re-score of the selected candidates by direct subtraction:
            # the matmul expansion can't represent self-distance as exactly 0
            # (skews the inverse-distance interpolation weights), and the approx
            # selection needs its distances/order made exact. The [B·csize·k, C]
            # random-row gather is the cost — skipped when need_dist=False.
            from .gather import index_points

            neigh = index_points(points, idx)          # [B, csize, k(+1), C]
            delta = qc[:, :, None, :] - neigh
            d2_sel = jnp.sum(delta * delta, axis=-1)
            if keff < k:
                # keep the k>n pad sentinel: re-scoring pad index 0 would
                # assign its true distance and re-sort it forward, breaking
                # the CUDA tail contract above
                ncols = d2_sel.shape[-1]
                pad_col = jnp.arange(ncols) >= ncols - (k - keff)
                d2_sel = jnp.where(pad_col, jnp.float32(1e10), d2_sel)
            if include_self:
                d2_sel = jnp.concatenate(
                    [d2_sel[..., :1],
                     jnp.where(dup, _BIG, d2_sel[..., 1:])], axis=-1)
        else:
            # Selection-precision distances: self is pinned to exactly 0 and
            # duplicates of it to _BIG so the dedup/ordering semantics match the
            # exact path; everything else keeps the matmul-expansion value.
            d2_sel = jnp.maximum(-vals, 0.0)
            if include_self:
                zeros = jnp.zeros(d2_sel[..., :1].shape, d2_sel.dtype)
                d2_sel = jnp.concatenate(
                    [zeros, jnp.where(dup, _BIG, d2_sel)], axis=-1)

        if include_self and not need_dist:
            # Sort-free self-first dedup: selection output is already sorted
            # ascending, so the final list is [self] + the candidates with the
            # self-duplicate removed (or the last dropped when absent) — a
            # shifted gather. The k+1-wide top_k this replaces was 60% of the
            # whole kNN at the crop stage (35 -> 14 ms at [16,3072] k=36).
            any_dup = jnp.any(dup, axis=-1)
            dpos = jnp.where(any_dup, jnp.argmax(dup, axis=-1), k - 1)
            j = jnp.arange(k - 1, dtype=jnp.int32)
            # the shift is 0 or 1, so two STATIC slices + where beat both the
            # k+1-wide top_k AND a take_along_axis (small-trailing-dim gathers
            # are the slow thing on TPU; see the layout notes everywhere)
            sel = j >= dpos[..., None]                       # [..., k-1]
            cand_idx = jnp.where(sel, idx[..., 2:k + 1], idx[..., 1:k])
            cand_d2 = jnp.where(sel, d2_sel[..., 2:k + 1], d2_sel[..., 1:k])
            idx = jnp.concatenate([idx[..., :1], cand_idx], axis=-1)
            d2o = jnp.concatenate([d2_sel[..., :1], cand_d2], axis=-1)
        elif include_self or need_dist:
            # ascending re-sort down to k via top_k (argsort lowers ~30x slower
            # on TPU for these shapes)
            neg_d, order = jax.lax.top_k(-d2_sel, k)
            idx = jnp.take_along_axis(idx, order, axis=-1)
            d2o = jnp.maximum(-neg_d, 0.0)
        else:
            d2o = d2_sel  # top_k/approx_max_k already return sorted ascending d2
        # double-where safe sqrt: grad of sqrt at exactly 0 (self/duplicate
        # points) is inf and would poison geometry gradients downstream
        dist = jnp.where(d2o > 0, jnp.sqrt(jnp.where(d2o > 0, d2o, 1.0)), 0.0)
        return idx.astype(jnp.int32), dist

    idx, dist = jax.lax.map(one_chunk, (qchunks, qidx_chunks))  # [n_chunks, B, csize, k]
    idx = jnp.moveaxis(idx, 0, 1).reshape(b, n_chunks * csize, k)[:, :m]
    dist = jnp.moveaxis(dist, 0, 1).reshape(b, n_chunks * csize, k)[:, :m]
    if squeeze:
        return idx[0], dist[0]
    return idx, dist


def finalize_selection(query: jnp.ndarray, points: jnp.ndarray,
                       idx: jnp.ndarray, qi: jnp.ndarray, k: int, *,
                       include_self: bool = False, need_dist: bool = True):
    """Shared post-selection finalize for alternate selection backends (the
    Pallas kernel): exact re-score of the selected candidates by direct
    subtraction, optional self-inclusion (prepend ``qi``, drop its duplicate),
    ascending re-sort, safe sqrt — identical semantics to the default path's
    in-chunk finalize above.

    query/points: ``[B, M, C]`` / ``[B, N, C]``; idx ``[B, M, k]``; qi
    ``[B, M]`` the query's own index into ``points`` (used when
    ``include_self``). Returns ``(idx [B, M, k] int32, dist [B, M, k] f32)``.
    """
    from .gather import index_points

    dup = None
    if include_self:
        self_col = qi[..., None].astype(idx.dtype)
        dup = idx == self_col
        idx = jnp.concatenate([self_col, idx], axis=-1)
    neigh = index_points(points, idx)
    delta = query[:, :, None, :] - neigh
    d2 = jnp.sum(delta * delta, axis=-1)
    if include_self:
        d2 = jnp.concatenate(
            [d2[..., :1], jnp.where(dup, _BIG, d2[..., 1:])], axis=-1)
    neg_d, order = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(idx, order, axis=-1)
    d2o = jnp.maximum(-neg_d, 0.0)
    dist = jnp.where(d2o > 0, jnp.sqrt(jnp.where(d2o > 0, d2o, 1.0)), 0.0)
    return idx.astype(jnp.int32), dist


@partial(jax.jit, static_argnames=("k", "n_anchors", "n_cand", "n_probe",
                                   "anchor_mode"))
def knn_two_level(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    p_mask: jnp.ndarray | None = None,
    *,
    n_anchors: int = 2048,
    n_cand: int = 512,
    n_probe: int = 1,
    anchor_mode: str = "prefix",
):
    """Anchor-bucketed approximate kNN for LARGE query sets against a
    moderate reference cloud — ``[M, 3] x [N, 3] -> (idx, d2) [M, k]``.

    The flat path (``knn_points``) materializes the full ``[M, N]`` distance
    matrix: at the pipeline's purity query (104k x 24k, k=40) that is ~10 GB
    of HBM traffic — measured 109 ms chained, 4x the bandwidth floor. This
    routine never forms it. STATUS at that call site: the per-query candidate
    re-score (step 3) is GATHER-bound, and at M ~ 100k the per-coordinate
    [M, P*C] gathers lower to a scalar-indexed form that measured ~50x slower
    than the flat path — purity therefore stays flat
    (postprocess/boundary.py). The op is correct (contract-tested below the
    pathological M) and suited to moderate-M queries where selection, not
    gather, dominates:

      1. assign each query to its ``n_probe`` nearest of ``n_anchors`` anchor
         points (``anchor_mode="prefix"``: the FIRST ``n_anchors`` reference
         points — callers pass FPS-ordered clouds, whose prefix IS a farthest-
         point sample, i.e. the best possible anchor spread; pipelines/tgn.py
         feeds exactly that. ``"strided"``: every (N/A)-th point, for sorted
         or arbitrary-order clouds),
      2. precompute each anchor's ``n_cand`` nearest reference points
         (one small ``[A, N]`` selection),
      3. re-score each query EXACTLY (direct f32 subtraction — no matmul
         cancellation) against the union of its probed anchors' candidate
         lists and take the top ``k``.

    Approximation scope: candidate-set membership only — a true neighbor is
    missed only if it lies outside the ``n_probe * n_cand`` candidates of the
    query's nearest anchors (with the defaults: the ~32 nearest anchor cells
    of ~12 points each; recall measured 1.0 at the pipeline shapes, see
    tests/test_ops.py::TestTwoLevelKNN). Distances and order WITHIN the set
    are exact (f32 direct subtraction), unlike the flat TPU path's
    matmul-expansion precision — so the returned d2 of the true nearest is
    exactly 0 for coincident points.

    Returns squared distances (not sqrt) — both call sites consume d2/labels.
    """
    m = query.shape[0]
    n = points.shape[0]
    a = min(n_anchors, n)
    c_eff = min(n_cand, n)
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if anchor_mode == "strided":
        # spatially sorted (or arbitrary-order) clouds: a strided subset is
        # stratified across the cloud; the prefix would be one spatial slab
        anchors = points[::max(1, n // a)][:a]
    else:
        anchors = points[:a]

    if p_mask is None:
        bias = jnp.zeros((n,), jnp.float32)
    else:
        bias = jnp.where(p_mask.astype(bool), 0.0, _BIG)

    # 2. per-anchor candidate lists: [A, n_cand] (selection-precision is fine
    # here — membership only; per-query scoring below is exact)
    cd2 = _batched_sqdist(anchors[None], points[None])[0] + bias[None, :]
    if _use_approx_topk() and n >= 1024 and c_eff <= 4096:
        _, cand = jax.lax.approx_max_k(-cd2, c_eff, recall_target=0.95)
    else:
        _, cand = jax.lax.top_k(-cd2, c_eff)                    # [A, C]

    # 1. anchor assignment (matmul-precision argmin is fine: a query near a
    # cell border probes BOTH cells when n_probe >= 2)
    ad2 = _batched_sqdist(query[None], anchors[None])[0]        # [M, A]
    if n_probe == 1:
        probe = jnp.argmin(ad2, axis=1)[:, None]                # [M, 1]
    else:
        _, probe = jax.lax.top_k(-ad2, n_probe)                 # [M, P]

    # 3. exact re-score over the candidate union. Per-COORDINATE gathers: a
    # row gather into [M, P*C, 3] would tile-pad the trailing dim 3 -> 128
    # lanes (27 GB at the purity shape — observed OOM); three [M, P*C] f32
    # planes tile perfectly.
    cidx = cand[probe].reshape(m, n_probe * c_eff)              # [M, P*C]
    d2 = jnp.take(bias, cidx)
    for ci in range(query.shape[1]):
        pc = jnp.take(points[:, ci], cidx)
        d2 = d2 + (query[:, ci:ci + 1] - pc) ** 2
    # NOTE: with n_probe > 1 the candidate union may contain duplicates, and
    # a duplicated point can occupy several top-k slots. Both call sites are
    # immune (purity: n_probe=1; 1-NN transfer: k=1); a per-query dedup would
    # cost an [M, P*C, P*C] comparison — do not add one casually.
    keff = min(k, n_probe * c_eff)
    neg, pos = jax.lax.top_k(-d2, keff)
    idx = jnp.take_along_axis(cidx, pos, axis=1)
    d2k = jnp.maximum(-neg, 0.0)
    if keff < k:
        idx = jnp.concatenate([idx] + [idx[:, -1:]] * (k - keff), axis=1)
        d2k = jnp.concatenate([d2k] + [d2k[:, -1:]] * (k - keff), axis=1)
    return idx.astype(jnp.int32), d2k


@partial(jax.jit, static_argnames=("k", "n_slabs", "win_frac", "sel_bf16"))
def knn_self_windowed(points, k: int, *, n_slabs: int = 16,
                      win_frac: int = 5, sel_bf16: bool = False):
    """Axis-windowed SELF-kNN for large unmasked clouds —
    ``[B, N, 3] -> (idx [B, N, k] int32, d2 [B, N, k] selection-precision)``,
    with the ``include_self`` guarantee (own index first, distance 0).

    The serving backbone's per-stage self-kNN is selection-traffic-bound
    (24000^2 = 18 ms, 16 crops x 3072^2 = 13.8 ms, r4 A/B): each batch cloud
    is argsorted along its max-variance axis, split into ``n_slabs``
    equal-count slabs, and each slab's queries score only a STATIC
    quantile-aligned window of ``win_frac/n_slabs`` of the cloud — a 16/5
    layout cuts the [N, N] matrix 3.2x. Same scheme and caveats as the
    serving-side windowed queries (postprocess/boundary.py:_purity_window_fn):
    candidate membership is window-bounded + approx_max_k recall (~.95) +
    optional bf16-selection ties; consumers are the attention/TransitionDown
    neighbor SETS, which already accept the approx scope
    (knn_points docstring). Inference-only by construction — callers gate on
    ``train`` (train keeps the flat path, whose statistics the parity tests
    pin). Requires N % n_slabs == 0 and no mask (callers fall back
    otherwise).
    """
    b, n, _ = points.shape
    ns = n_slabs
    cl = n // ns
    win_w = min(n, cl * win_frac)
    starts_py = [min(max((s - win_frac // 2) * cl, 0), n - win_w)
                 for s in range(ns)]

    p = points.astype(jnp.float32)
    ax = jnp.argmax(jnp.var(p, axis=1), axis=-1)              # [B]
    val = jnp.take_along_axis(
        p, jnp.broadcast_to(ax[:, None, None], (b, n, 1)), axis=2)[..., 0]
    order = jnp.argsort(val, axis=1).astype(jnp.int32)        # [B, N]
    from .gather import index_points

    ps = index_points(p, order)                               # [B, N, 3]
    q = ps.reshape(b, ns, cl, 3).reshape(b * ns, cl, 3)
    win = jnp.stack([jax.lax.slice(ps, (0, st, 0), (b, st + win_w, 3))
                     for st in starts_py], axis=1)            # [B, ns, W, 3]
    win = win.reshape(b * ns, win_w, 3)

    d2 = _batched_sqdist(q, win)                              # [B·ns, cl, W]
    keff = min(k, win_w)
    if sel_bf16:
        vals, idx = jax.lax.approx_max_k((-d2).astype(jnp.bfloat16), keff,
                                         recall_target=0.95)
        vals = vals.astype(jnp.float32)
    else:
        vals, idx = jax.lax.approx_max_k(-d2, keff, recall_target=0.95)

    # include_self: own window-local index first, drop its duplicate — the
    # sort-free shifted-slice dedup from knn_points's fast path
    starts = jnp.asarray(starts_py, jnp.int32)                # [ns]
    self_loc = (jnp.arange(n, dtype=jnp.int32).reshape(ns, cl)
                - starts[:, None])                            # [ns, cl]
    self_col = jnp.broadcast_to(self_loc[None], (b, ns, cl)
                                ).reshape(b * ns, cl)[..., None]
    dup = idx == self_col
    idx = jnp.concatenate([self_col, idx], axis=-1)
    d2s = jnp.maximum(-vals, 0.0)
    zeros = jnp.zeros(d2s[..., :1].shape, d2s.dtype)
    d2s = jnp.concatenate([zeros, jnp.where(dup, _BIG, d2s)], axis=-1)
    any_dup = jnp.any(dup, axis=-1)
    dpos = jnp.where(any_dup, jnp.argmax(dup, axis=-1), keff - 1)
    j = jnp.arange(keff - 1, dtype=jnp.int32)
    sel = j >= dpos[..., None]
    cand_idx = jnp.where(sel, idx[..., 2:keff + 1], idx[..., 1:keff])
    cand_d2 = jnp.where(sel, d2s[..., 2:keff + 1], d2s[..., 1:keff])
    idx = jnp.concatenate([idx[..., :1], cand_idx], axis=-1)  # [B·ns, cl, k]
    d2o = jnp.concatenate([d2s[..., :1], cand_d2], axis=-1)

    # window-local -> sorted position -> ORIGINAL index; scatter rows back to
    # original query order
    gsort = (starts[None, :, None, None]
             + idx.reshape(b, ns, cl, keff))                  # [B,ns,cl,k]
    gidx = index_points(order[..., None], gsort.reshape(b, n, keff)
                        )[..., 0].astype(jnp.int32)           # [B, N, k]
    out_i = jnp.zeros((b, n, keff), jnp.int32)
    out_d = jnp.zeros((b, n, keff), jnp.float32)
    brow = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    out_i = out_i.at[brow, order].set(gidx)
    out_d = out_d.at[brow, order].set(d2o.reshape(b, n, keff))
    if keff < k:
        # unreachable under knn_self's gate (n >= 2048 => win_w >= 640 > k),
        # but direct callers get the same CUDA unfilled-heap tail contract as
        # knn_points: index 0 at dist2 = 1e10 (knnquery_cuda_kernel.cu:87-91)
        out_i = jnp.concatenate(
            [out_i] + [jnp.zeros_like(out_i[..., :1])] * (k - keff), -1)
        out_d = jnp.concatenate(
            [out_d] + [jnp.full_like(out_d[..., :1], 1e10)] * (k - keff), -1)
    dist = jnp.where(out_d > 0, jnp.sqrt(jnp.where(out_d > 0, out_d, 1.0)),
                     0.0)
    return out_i, dist


def knn_self(points, k, p_mask=None, *, train: bool = True,
             mask_per_cloud: bool = False, **kw):
    """Self-kNN dispatcher for the backbone's per-stage neighborhoods:
    flat approx path by default; ``TGN_TPU_STAGE_KNN=window`` opts inference
    on large unmasked TPU clouds into :func:`knn_self_windowed`.
    Default flipped window->flat in r5: the DCE-proof chained A/B
    (tools/profile_r5.py, 2026-08-19) measured the window path SLOWER at both
    backbone shapes — 16x3072 k=36: 33.1 vs 17.5 ms flat (the argsort +
    scatter-back overhead dwarfs the saved selection traffic at crop sizes),
    1x24k k=36: 20.6 vs 17.7 — and it was the main source of BENCH_r04's
    bdl:fused +41 ms / fps:stage2 +18 ms phase regressions.
    ``mask_per_cloud``: the caller guarantees ``p_mask`` is constant within
    each batch cloud (whole-crop validity) — the windowed path is then valid
    under a mask too (dead clouds yield garbage neighborhoods that the
    caller masks downstream)."""
    n = points.shape[1]
    if (not train and (p_mask is None or mask_per_cloud)
            and _use_approx_topk()
            and n >= 2048 and n % 16 == 0
            and os.environ.get("TGN_TPU_STAGE_KNN", "flat") == "window"):
        # same TGN_TPU_KNN_SEL=f32|bf16 force-override contract as knn_points
        # (round-4 advisor: f32-forcing must cover the stage self-kNN too)
        env_sel = os.environ.get("TGN_TPU_KNN_SEL", "auto")
        sb = (not train) if env_sel == "auto" else env_sel == "bf16"
        return knn_self_windowed(points, k, sel_bf16=sb)
    return knn_points(points, points, k, p_mask, p_mask,
                      include_self=True, need_dist=False,
                      sel_bf16=not train, **kw)


def knn(query, points, k, q_mask=None, p_mask=None, **kw):
    """Alias of :func:`knn_points`."""
    return knn_points(query, points, k, q_mask, p_mask, **kw)
