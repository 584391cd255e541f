"""Boundary-aware resampling.

The tgnet second-stage data engine (reference: inference_pipeline_tgn.py:289-330 at
inference; bdl_grouping_netowrk_model.py:133-192 at training): given per-point
instance labels on the 24k sampled cloud, label the full-resolution mesh by 1-NN,
score each full-res vertex's 40-NN label purity, mark vertices below
``bdl_ratio`` (0.7) as boundary, then build a boundary-focused 24k cloud =
20000 uniformly-sampled boundary points + FPS of the rest.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from .clustering import first_label_ratio


_purity_device_jit = None
_purity_window_jit = None

# windowed purity (the TPU default at production sizes): queries and the
# sampled cloud are axis-sorted in-program; each of _WIN_SLABS equal-count
# query slabs kNNs into a quantile-aligned window of _WIN_FRAC/_WIN_SLABS of
# the sampled cloud instead of all of it — 16/5 cuts the dominant [Np, M]
# selection traffic 3.2x. Window misses require a 40-NN radius larger than
# the window's slab margin (frac=5 → ±2 slabs ≈ 12.5% of the sampled mass;
# frac=3 → ±1 slab ≈ 6.25%), vs a 40-NN radius of ~sqrt(40/24000) ≈ 2.3% of
# the extent — surface scans at 24k density never approach either bound; see
# _purity_window_fn for the per-output exactness notes. TGN_TPU_WIN_FRAC
# overrides (odd values give symmetric margins; contract-tested at 3 and 5).
_WIN_SLABS = 16


def _win_frac() -> int:
    import os

    return int(os.environ.get("TGN_TPU_WIN_FRAC", "5"))

# speculative non-boundary FPS quota fused into the purity program: the
# boundary mask is computed IN-program, so the "fill the 24k cloud from the
# non-boundary rest" FPS (pipeline: need = 24000 - min(n_boundary, 20000),
# i.e. need <= 4096 whenever the 20000 boundary cap binds — the common case
# on full-size scans) can run right there and its index plane (16 KB) ride
# the same fetch — one fewer dispatch + tunnel round trip per scan. Scans
# with fewer boundary points fall back to the separate _masked_fps dispatch.
_SPEC_FPS = 4096


def _purity_device_fn(org_xyz, sampled_xyz, labels, k: int,
                      bdl_ratio: float = 0.7, n_valid=None):
    """[Np,3] x [M,3] -> (bd_mask [Np] bool, nn1_label [Np] u8, nn1 [Np] i32,
    nn1_d2 [Np] f32, fps_idx [_SPEC_FPS] i32) on device: 40-NN label purity +
    1-NN label + speculative non-boundary-fill FPS, MXU distances instead of
    a host KD-tree sweep. Jitted ONCE at module scope — a per-call
    ``jax.jit(partial(...))`` wrapper would recompile the 100k x 24k graph on
    every scan (measured 21 s/scan).

    Tunnel-fetch discipline (CLAUDE.md: the tunnel moves ~10-15 MB/s, every
    fetched MB costs ~70-90 ms/scan): the boundary THRESHOLD is applied
    in-program so the pipeline fetches a [Np] bool instead of the f32 ratio,
    and the 1-NN label is returned uint8 (instance ids are small ints). The
    nn1 index / squared distance outputs are meant to STAY on device — the
    pipeline's final transfer consumes them there (``_final_transfer_fn``).

    Exactness: the 1-NN label becomes the boundary points' OUTPUT semantics, so
    its identity is re-derived by an exact f32 re-score of the top-4 approx
    candidates (approx_max_k retains each reduction bin's maximum, but its
    matmul-expansion distances can misorder near-ties; the narrow re-score
    fixes the order at ~1/10 the cost of a full need_dist=True 40-wide
    re-score). This call site opts into the bf16 SELECTION matrix
    (``sel_bf16=True`` — serving-only; A/B 252 -> 222 ms/scan), which weakens
    the guarantee by one notch: candidate MEMBERSHIP is decided on bf16-rounded
    -d2, so when the true nearest and another point round to the same bf16
    value either may enter the candidate set — the returned 1-NN is then exact
    within the set, i.e. exact up to bf16 near-ties (indistinguishable at
    ~1e-3 relative d2, far below the mesh's vertex spacing). The purity RATIO
    keeps approx-selection membership for the other 39 columns — it is a mean
    over 40 labels and insensitive to per-neighbor recall ~0.95."""
    global _purity_device_jit
    if _purity_device_jit is None:
        import jax
        import jax.numpy as jnp

        from ..ops import farthest_point_sample, knn_points
        from ..ops.gather import index_points

        def fn(org_xyz, sampled_xyz, labels, bdl_ratio, n_valid, k):
            # accept [Np,6] feats buffers (the pipeline reuses resident
            # uploads that carry all 6 channels; XLA slices for free) and
            # f16 uploads (TGN_TPU_UPLOAD=f16 halves the tunnel bytes)
            org_xyz = org_xyz[:, :3].astype(jnp.float32)
            sampled_xyz = sampled_xyz[:, :3].astype(jnp.float32)
            idx, _ = knn_points(org_xyz, sampled_xyz, k, None, None,
                                need_dist=False, sel_bf16=True)
            # exact re-score of the leading candidates -> true 1-NN identity
            j = min(4, k)
            cand = idx[:, :j]                               # [Np, j]
            cand_xyz = index_points(sampled_xyz, cand)      # [Np, j, 3]
            delta = org_xyz[:, None, :].astype(jnp.float32) - cand_xyz
            d2 = jnp.sum(delta * delta, axis=-1)
            best = jnp.argmin(d2, axis=-1)                  # [Np]
            nn1 = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
            nn1_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
            nn1_lab = jnp.take(labels, nn1)
            lab = jnp.take(labels, idx.reshape(-1)).reshape(idx.shape)
            ratio = jnp.mean((lab == nn1_lab[:, None]).astype(jnp.float32),
                             axis=1)
            # nn1/nn1_d2 let the pipeline SKIP re-solving org->sampled in its
            # final 1-NN transfer (pipelines/tgn.py: the KD-tree then only
            # covers the <=20k boundary points instead of the 44k concat)
            bd = ratio < bdl_ratio
            ok = (jnp.arange(org_xyz.shape[0]) < n_valid) & ~bd
            fps_idx = farthest_point_sample(org_xyz, _SPEC_FPS, ok)
            return (bd, nn1_lab.astype(jnp.uint8), nn1, nn1_d2, fps_idx)

        _purity_device_jit = jax.jit(fn, static_argnames=("k",))
    import jax.numpy as jnp

    if n_valid is None:
        n_valid = org_xyz.shape[0]
    return _purity_device_jit(org_xyz, sampled_xyz, labels,
                              jnp.float32(bdl_ratio),
                              jnp.int32(n_valid), k=k)


def _purity_window_fn(org_pad, sampled_xyz, labels, k: int,
                      bdl_ratio: float = 0.7, n_valid=None,
                      qorder=None, ax=None, win_frac: int | None = None):
    """Axis-windowed variant of :func:`_purity_device_fn` — same output
    contract ``(bd, nn1_lab, nn1, nn1_d2, fps_idx)``, ~3x cheaper at the
    production shape (the [Np, M] candidate axis shrinks to a
    ``_WIN_FRAC/_WIN_SLABS`` window; the speculative fill-FPS additionally
    runs slab-chunked — ``_SPEC_FPS/_WIN_SLABS`` sequential iterations instead
    of ``_SPEC_FPS``, the same two-level scheme as the mesh-prep FPS,
    pipelines/base.py:fps_sample_idx_chunked).

    Structure (everything in ONE jitted program):
      1. pick the sampled cloud's max-variance axis; argsort both clouds by it,
      2. scatter the sorted org rows into ``_WIN_SLABS`` equal-valid-count
         slabs (the fused-FPS partition scheme, pipelines/base.py),
      3. slice the sorted sampled cloud into one static quantile-aligned
         window of ``ceil(M*_WIN_FRAC/_WIN_SLABS)`` rows per query slab
         (edge windows clamp inward, so every window is full-width real rows),
      4. batched kNN slab->window, exact f32 re-score of the top-4 for the
         1-NN, label-share ratio over the k candidates,
      5. slab-chunked masked FPS over the non-boundary rows,
      6. scatter every per-slab plane back to original padded-row order.

    Exactness vs the flat path: the 1-NN re-score and its d2 are exact f32
    WITHIN the window, and candidate membership carries the same
    approx_max_k/bf16-selection scope as the flat path PLUS the window bound
    (a true neighbor outside +-2 sampled-quantile slabs of the query's slab is
    unreachable — geometrically impossible for surface scans at these
    densities, and contract-tested against the host KD-tree on synthetic
    scans). The fill-FPS becomes two-level approximate like the mesh-prep
    sampler (the reference's own fill is an offline-grade FPS,
    inference_pipeline_tgn.py:312). ``TGN_TPU_PURITY=flat`` opts out.
    """
    global _purity_window_jit
    if _purity_window_jit is None:
        import jax
        import jax.numpy as jnp

        from ..ops import farthest_point_sample, knn_points
        from ..ops.gather import index_points

        def fn(org_pad, sampled_xyz, labels, bdl_ratio, n_valid, qorder,
               ax, k, win_frac):
            org = org_pad[:, :3].astype(jnp.float32)
            smp = sampled_xyz[:, :3].astype(jnp.float32)
            npad, m = org.shape[0], smp.shape[0]
            ns = _WIN_SLABS
            chunk_pad = npad // ns
            win_w = min(m, -(-m * win_frac // ns))
            starts_py = [min(max((s - win_frac // 2) * m // ns, 0),
                             m - win_w) for s in range(ns)]

            if ax is None:
                ax = jnp.argmax(jnp.var(smp, axis=0)).astype(jnp.int32)

            # sorted sampled cloud + per-slab static windows
            sorder = jnp.argsort(jnp.take(smp, ax, axis=1)).astype(jnp.int32)
            s_sorted = jnp.take(smp, sorder, axis=0)            # [M, 3]
            lab_sorted = jnp.take(labels, sorder)               # [M]
            win = jnp.stack([jax.lax.dynamic_slice(
                s_sorted, (st, 0), (win_w, 3)) for st in starts_py])
            wlab = jnp.stack([jax.lax.dynamic_slice(
                lab_sorted, (st,), (win_w,)) for st in starts_py])
            starts = jnp.asarray(starts_py, jnp.int32)          # [ns]

            # equal-valid-count query slabs (fused-FPS partition scheme).
            # qorder (the fused FPS partition's sort of the SAME buffer by the
            # SAME key, pipelines/base.py) skips the ~104k in-program argsort.
            i = jnp.arange(npad, dtype=jnp.int32)
            if qorder is None:
                key = jnp.where(i < n_valid, jnp.take(org, ax, axis=1),
                                jnp.inf)
                qorder = jnp.argsort(key).astype(jnp.int32)
            chunk_len = (n_valid + ns - 1) // ns
            slab = i // chunk_len
            pos = i - slab * chunk_len
            qrows = jnp.take(org, qorder, axis=0)
            q = jnp.zeros((ns, chunk_pad, 3), jnp.float32
                          ).at[slab, pos].set(qrows, mode="drop")
            qvalid = jnp.zeros((ns, chunk_pad), bool
                               ).at[slab, pos].set(i < n_valid, mode="drop")
            # global row of each slab slot; npad (out of range) on empty slots
            # so the scatter-back below drops them
            qgidx = jnp.full((ns, chunk_pad), npad, jnp.int32
                             ).at[slab, pos].set(qorder, mode="drop")

            idxw, _ = knn_points(q, win, k, None, None, need_dist=False,
                                 sel_bf16=True)                 # [ns, cp, k]
            # exact re-score of the leading candidates -> window-true 1-NN
            j = min(4, k)
            cand = idxw[..., :j]
            cand_xyz = index_points(win, cand)      # [ns, cp, j, 3]
            delta = q[:, :, None, :] - cand_xyz
            d2 = jnp.sum(delta * delta, axis=-1)
            best = jnp.argmin(d2, axis=-1)
            nn1w = jnp.take_along_axis(cand, best[..., None], -1)[..., 0]
            nn1_d2s = jnp.take_along_axis(d2, best[..., None], -1)[..., 0]
            # per-slab gathers as ONE flat take with slab offsets (batched
            # take_along_axis lowers to a catastrophic gather on TPU — see
            # ops/gather.py:index_points)
            lab_flat = wlab.reshape(-1)
            offs = (jnp.arange(ns, dtype=jnp.int32) * win_w)
            nn1_g = jnp.take(sorder, starts[:, None] + nn1w)    # [ns, cp]
            nn1_labs = jnp.take(lab_flat,
                                (offs[:, None] + nn1w).reshape(-1)
                                ).reshape(nn1w.shape)
            labw = jnp.take(lab_flat,
                            (offs[:, None, None] + idxw).reshape(-1)
                            ).reshape(idxw.shape)
            ratio = jnp.mean((labw == nn1_labs[..., None]).astype(jnp.float32),
                             axis=-1)
            bd_s = ratio < bdl_ratio                            # [ns, cp]

            # slab-chunked speculative fill-FPS over the non-boundary rows
            ok = qvalid & ~bd_s
            quota = _SPEC_FPS // ns
            floc = farthest_point_sample(q, quota, ok)          # [ns, quota]
            qoffs = jnp.arange(ns, dtype=jnp.int32)[:, None] * chunk_pad
            gfps = jnp.take(qgidx.reshape(-1),
                            (qoffs + jnp.minimum(floc, chunk_pad - 1)
                             ).reshape(-1)).reshape(floc.shape)
            gfps = jnp.clip(gfps, 0, jnp.maximum(n_valid - 1, 0))
            fps_idx = jnp.moveaxis(gfps, 0, 1).reshape(-1)      # rank-major

            # scatter back to original padded-row order
            flat = qgidx.reshape(-1)
            bd = jnp.zeros((npad,), bool).at[flat].set(
                bd_s.reshape(-1), mode="drop")
            nn1_lab = jnp.zeros((npad,), labels.dtype).at[flat].set(
                nn1_labs.reshape(-1), mode="drop")
            nn1 = jnp.zeros((npad,), jnp.int32).at[flat].set(
                nn1_g.reshape(-1), mode="drop")
            nn1_d2 = jnp.zeros((npad,), jnp.float32).at[flat].set(
                nn1_d2s.reshape(-1), mode="drop")
            return bd, nn1_lab, nn1, nn1_d2, fps_idx

        _purity_window_jit = jax.jit(fn, static_argnames=("k", "win_frac"))
    import jax.numpy as jnp

    if n_valid is None:
        n_valid = org_pad.shape[0]
    if ax is not None:
        ax = jnp.int32(ax)
    if win_frac is None:
        win_frac = _win_frac()
    return _purity_window_jit(org_pad, sampled_xyz, labels,
                              jnp.float32(bdl_ratio), jnp.int32(n_valid),
                              qorder, ax, k=k, win_frac=win_frac)


def _boundary_purity(org_xyz: np.ndarray, sampled_xyz: np.ndarray,
                     point_labels: np.ndarray, k: int, bdl_ratio: float,
                     device_ctx: dict | None = None, sampled_dev=None,
                     timings: dict | None = None):
    """Returns (boundary mask [N] bool, 1-NN label [N], 1-NN index [N] or
    None, 1-NN squared distance [N] or None). Device path on TPU (bucketed
    query size, one compiled executable per size bucket); host KD-tree
    elsewhere. The device 1-NN is exact (narrow re-score in
    _purity_device_fn); only the purity ratio's 40-neighbor MEMBERSHIP is
    approx-selection (recall ~0.95), which the thresholded mean is insensitive
    to.

    On the device path the nn1 index/distance are returned as ``None`` to the
    host and instead stashed in ``device_ctx`` as DEVICE arrays
    (``nn1_dev``/``nn1_d2_dev`` over the PADDED query cloud) — the pipeline's
    final 1-NN transfer consumes them on device (fetching the f32/i32 pair
    would move 800 KB/scan through the ~10-15 MB/s tunnel for no host use).
    ``device_ctx`` also receives ``org_pad_dev``/``sampled_dev`` so later
    dispatches reuse the uploads."""
    import jax

    n0 = org_xyz.shape[0]
    if jax.default_backend() in ("tpu", "axon") and n0 > 32768:
        import jax.numpy as jnp

        bucket = 8192
        n_pad = -(-n0 // bucket) * bucket
        if (device_ctx is not None
                and device_ctx.get("n_org") == n0
                and "feats_pad_dev" in device_ctx
                and device_ctx["feats_pad_dev"].shape[0] == n_pad):
            # the mesh-prep FPS already shipped this cloud (fps_sample_dev's
            # fused route stashes its padded buffer; for unsubdivided meshes
            # — always true at this gate size — org IS the FPS source): reuse
            # it instead of re-uploading ~1.2 MB. Consumers (_purity_device_fn,
            # _masked_fps, tgn._bdl_nn1_fn) slice xyz in-program for free.
            pad_dev = device_ctx["feats_pad_dev"]
        else:
            pad = np.zeros((n_pad, 3), np.float32)
            pad[:n0] = org_xyz
            pad_dev = jnp.asarray(pad)
        if sampled_dev is None:
            sampled_dev = jnp.asarray(
                np.ascontiguousarray(sampled_xyz, np.float32))
        import os

        import time as _time

        t0 = _time.perf_counter()
        m = sampled_xyz.shape[0]
        use_window = (os.environ.get("TGN_TPU_PURITY", "window") == "window"
                      and m >= 4096 and n_pad % _WIN_SLABS == 0)
        if use_window:
            # reuse the fused FPS partition's argsort of this exact buffer
            # (device-resident; same key construction) when available
            qorder = ax = None
            if (device_ctx is not None
                    and device_ctx.get("feats_pad_dev") is pad_dev
                    and "org_order_dev" in device_ctx):
                qorder = device_ctx["org_order_dev"]
                ax = device_ctx["org_order_ax"]
            bd_mask, nn1_lab, nn1, nn1_d2, fps_idx = _purity_window_fn(
                pad_dev, sampled_dev,
                jnp.asarray(point_labels.astype(np.uint8)), k, bdl_ratio,
                n_valid=n0, qorder=qorder, ax=ax)
        else:
            bd_mask, nn1_lab, nn1, nn1_d2, fps_idx = _purity_device_fn(
                pad_dev, sampled_dev,
                jnp.asarray(point_labels.astype(np.uint8)), k, bdl_ratio,
                n_valid=n0)
        t1 = _time.perf_counter()
        if timings is not None:
            timings["host_boundary_resample/purity_dispatch"] += t1 - t0
        if device_ctx is not None:
            device_ctx["org_pad_dev"] = pad_dev
            device_ctx["bd_mask_dev"] = bd_mask  # device handle survives the fetch
            device_ctx["n_org"] = n0
            device_ctx["nn1_dev"] = nn1
            device_ctx["nn1_d2_dev"] = nn1_d2
            bd_mask, nn1_lab, device_ctx["nonbd_fps_idx"] = jax.device_get(
                (bd_mask, nn1_lab, fps_idx))
        else:
            bd_mask, nn1_lab = jax.device_get((bd_mask, nn1_lab))
        if timings is not None:
            timings["host_boundary_resample/purity_fetch"] += (
                _time.perf_counter() - t1)
        return (bd_mask[:n0], nn1_lab[:n0].astype(point_labels.dtype),
                None, None)

    tree = cKDTree(np.asarray(sampled_xyz)[:, :3])
    dist, nn = tree.query(org_xyz, k=k, workers=-1)
    nn = np.atleast_2d(nn)
    dist = np.atleast_2d(dist)
    return (first_label_ratio(point_labels[nn]) < bdl_ratio,
            point_labels[nn[:, 0]],
            nn[:, 0], (dist[:, 0] ** 2).astype(np.float32))


_masked_fps_jit = None
_MASKED_FPS_MAX = 8192


def _masked_fps(org_pad_dev, bd_mask_dev, n_valid: int, n_bucket: int):
    """Exact FPS over the NON-boundary subset of the (device-resident) padded
    org cloud: ``farthest_point_sample`` with ``valid = (row < n_valid) &
    ~boundary``. Selection is identical to compacting the subset on host and
    running exact FPS there (same seed — the first valid point — and the same
    per-iteration argmax set), but needs ZERO upload: both operands are
    already resident from the purity query (``org_pad_dev``/``bd_mask_dev``
    in ``device_ctx``), where the host route re-ships ~1 MB of non-boundary
    xyz through the ~10-15 MB/s tunnel (~70-100 ms/scan) plus a ~10 ms host
    partition sort. The fetched index plane is ``4*n_bucket`` bytes.

    ``n_bucket`` is static (the caller buckets the sample count to 512s; FPS
    is greedy-sequential so a prefix of a longer run IS the shorter run) —
    one executable per (org-pad bucket, n_bucket) pair."""
    global _masked_fps_jit
    if _masked_fps_jit is None:
        import jax
        import jax.numpy as jnp

        from ..ops import farthest_point_sample

        def fn(xyz, bd, n_valid, n_bucket):
            # accept a [Np,6] (possibly f16) resident feats buffer
            xyz = xyz[:, :3].astype(jnp.float32)
            ok = (jnp.arange(xyz.shape[0]) < n_valid) & ~bd
            return farthest_point_sample(xyz, n_bucket, ok)

        _masked_fps_jit = jax.jit(fn, static_argnames=("n_bucket",))
    return _masked_fps_jit(org_pad_dev, bd_mask_dev, n_valid,
                           n_bucket=n_bucket)


def boundary_sampled_feats(
    point_labels: np.ndarray,
    org_feats: np.ndarray,
    sampled_feats: np.ndarray,
    bdl_ratio: float = 0.7,
    num_bdl_points: int = 20000,
    num_all_points: int = 24000,
    rng: np.random.Generator | None = None,
    spatial_sort: bool = False,
    return_nn1: bool = False,
    device_ctx: dict | None = None,
    sampled_xyz_dev=None,
    timings: dict | None = None,
):
    """Returns (feats [num_all_points, 6], pseudo_labels [num_all_points],
    n_boundary) — boundary points first, matching the reference's concat order
    (inference_pipeline_tgn.py:311-318). With ``return_nn1``, additionally
    returns ``(nn1_idx [N], nn1_d2 [N])`` — each org vertex's exact nearest
    SAMPLED point (index + squared distance), a free byproduct of the purity
    query that the tgn pipeline reuses in its final 1-NN transfer. On the
    device purity path these two are ``(None, None)`` and live in
    ``device_ctx`` as device arrays instead (see ``_boundary_purity``).

    Args:
      point_labels: [M] instance labels of the sampled cloud (0 = gingiva).
      org_feats: [N, 6] full-resolution features to resample from.
      sampled_feats: [M, 6] the stage-1 sampled cloud.
      sampled_xyz_dev: optional DEVICE-resident [M, 3] copy of the sampled
        xyz — skips re-uploading 288 KB through the tunnel on the device path.
    """
    rng = rng or np.random.default_rng(0)
    k = min(40, sampled_feats.shape[0])
    bd_mask, ps_labels, nn1_idx, nn1_d2 = _boundary_purity(
        org_feats[:, :3].astype(np.float32), sampled_feats[:, :3],
        point_labels, k, bdl_ratio, device_ctx, sampled_dev=sampled_xyz_dev,
        timings=timings)

    bd_global = np.flatnonzero(bd_mask)
    bd_feats = org_feats[bd_mask]
    bd_labels = ps_labels[bd_mask]
    # uniform resample of boundary points to num_bdl_points (truncates when fewer)
    perm = rng.permutation(bd_feats.shape[0])[:num_bdl_points]
    bd_feats, bd_labels, bd_global = (bd_feats[perm], bd_labels[perm],
                                      bd_global[perm])

    need = num_all_points - bd_feats.shape[0]
    n_non_bd = org_feats.shape[0] - int(np.count_nonzero(bd_mask))
    if (device_ctx is not None and "nonbd_fps_idx" in device_ctx
            and n_non_bd > need and 0 < need <= _SPEC_FPS):
        # the purity program already ran the non-boundary FPS speculatively
        # and its index plane rode the purity fetch: a prefix of a longer
        # FPS run IS the shorter run — zero extra dispatches or round trips
        g_idx = device_ctx["nonbd_fps_idx"][:need]
        non_bd_feats = org_feats[g_idx]
        non_bd_labels = ps_labels[g_idx]
        nb_global = g_idx
    elif (device_ctx is not None and "bd_mask_dev" in device_ctx
            and n_non_bd > need and 0 < need <= _MASKED_FPS_MAX):
        # zero-upload device route: exact FPS over the non-boundary subset,
        # masked directly on the purity query's resident org cloud
        import jax

        n_bucket = min(-(-need // 512) * 512, n_non_bd)
        g_idx = np.asarray(jax.device_get(_masked_fps(
            device_ctx["org_pad_dev"], device_ctx["bd_mask_dev"],
            device_ctx["n_org"], n_bucket)))[:need]
        non_bd_feats = org_feats[g_idx]
        non_bd_labels = ps_labels[g_idx]
        nb_global = g_idx
    elif n_non_bd > need:
        from ..pipelines.base import fps_sample_idx

        non_bd_feats = org_feats[~bd_mask]
        non_bd_labels = ps_labels[~bd_mask]
        # bucketed device FPS: the non-boundary count varies per scan, and an
        # unbucketed call would recompile for every distinct size
        idx = fps_sample_idx(non_bd_feats[:, :3], need)
        non_bd_feats, non_bd_labels = non_bd_feats[idx], non_bd_labels[idx]
        nb_global = np.flatnonzero(~bd_mask)[idx]
    else:
        non_bd_feats = org_feats[~bd_mask]
        non_bd_labels = ps_labels[~bd_mask]
        # not enough non-boundary points: take all + repeat uniformly
        reps = rng.integers(0, max(non_bd_feats.shape[0], 1),
                            need - non_bd_feats.shape[0])
        idx = np.concatenate([np.arange(non_bd_feats.shape[0]), reps])
        non_bd_feats, non_bd_labels = non_bd_feats[idx], non_bd_labels[idx]
        nb_global = np.flatnonzero(~bd_mask)[idx]

    if spatial_sort:
        # sort WITHIN each segment (boundary block, then rest) so the
        # boundary-first concat contract ([:n_bd] slicing downstream) is
        # preserved while the cloud gains the sorted-cell locality the
        # super-row attention path needs (ops/cells.py)
        from ..ops.cells import spatial_sort_perm

        if bd_feats.shape[0]:
            o = spatial_sort_perm(bd_feats[:, :3])
            bd_feats, bd_labels, bd_global = (bd_feats[o], bd_labels[o],
                                              bd_global[o])
        if non_bd_feats.shape[0]:
            o = spatial_sort_perm(non_bd_feats[:, :3])
            non_bd_feats, non_bd_labels = non_bd_feats[o], non_bd_labels[o]
            nb_global = nb_global[o]

    feats = np.concatenate([bd_feats, non_bd_feats], axis=0)
    labels = np.concatenate([bd_labels, non_bd_labels], axis=0)
    if device_ctx is not None:
        # global org_feats row index of every output row — lets the pipeline
        # re-materialize this cloud ON DEVICE by gathering the resident padded
        # upload (96 KB index upload instead of the 576 KB row re-upload;
        # tunnel at ~16-30 MB/s makes that ~30-40 ms/scan)
        device_ctx["bdl_sel"] = np.concatenate(
            [bd_global, nb_global]).astype(np.int32)
    if return_nn1:
        return (feats.astype(np.float32), labels, bd_feats.shape[0],
                nn1_idx, nn1_d2)
    return feats.astype(np.float32), labels, bd_feats.shape[0]
