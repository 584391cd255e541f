"""tgnet two-stage inference pipeline — the flagship end-to-end path.

Faithful rebuild of the reference's tgn pipeline (reference:
inference_pipelines/inference_pipeline_tgn.py:10-330), restructured so the device
work is a handful of jitted static-shape calls and everything between is host numpy
(SURVEY.md §3.4 lists the reference's ≥6 ad-hoc device↔host round trips):

  1. mesh prep: dedup vertices, center, per-scan y-extent scale, subdivide if <24k,
     FPS to 24000,
  2. fps model stage 1 (jit): 10-class half-arch sem + offsets,
  3. host: DBSCAN/PCA/MeanShift instancing of offset-moved points → crop centroids,
  4. fps model stage 2 (jit) over 16 padded crops → per-crop FG/BG logits,
  5. host: vote aggregation → refined FG mask → final stage-1 instancing,
  6. host: boundary-purity resampling (20k boundary + 4k FPS),
  7. bdl model stage 1+2 (jit) on the boundary cloud, KMeans instancing,
  8. host: PCA arch disambiguation (9→16 classes) + boundary-cluster fusion,
  9. 1-NN transfer to all original vertices + FDI remap.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tgnet import TGNet, make_crops
from ..postprocess.boundary import boundary_sampled_feats
from ..postprocess.clustering import clustering_points, get_clustering_labels
from ..postprocess.fusion import disambiguate_arch_labels, merge_boundary_clusters
from .base import N_SAMPLE, fps_sample, fps_sample_dev
from ..data.scan_prep import prep_scan_host_tgn

K_MAX = 16  # crop slots; challenge jaws have <= 16 teeth


def prep_mesh_tgn(stl_path: str, n_sample: int = N_SAMPLE):
    """Returns (org_feats, bdl_feats, sampled_feats) — original-vertex features
    (post-dedup; the 1-NN output targets), the boundary-resampling source (subdivided
    when the mesh is small), and the 24k FPS sample. The numpy portion lives in
    the JAX-free ``data.scan_prep`` so ``run_many`` worker processes can run it."""
    org_feats, bdl_feats = prep_scan_host_tgn(stl_path, n_sample)
    sampled = fps_sample(bdl_feats, n_sample)
    return org_feats, bdl_feats, sampled.astype(np.float32)


def _pad_centroids(centroids: list[np.ndarray], k_max: int = K_MAX):
    """Host list of centroids → fixed [1, k_max, 3] + validity (largest-first
    truncation when more clusters than slots). Returns (device cents, device
    valid, HOST valid) — the host copy feeds vote aggregation without a
    round-trip fetch."""
    cents = np.full((1, k_max, 3), 1e3, np.float32)
    valid = np.zeros((1, k_max), bool)
    for i, c in enumerate(centroids[:k_max]):
        cents[0, i] = c
        valid[0, i] = True
    return jnp.asarray(cents), jnp.asarray(valid), valid


_bdl_nn1_jit = None
_bdl_nn1_sel_jit = None
_bdl_nn1_win_jit = None


def _nn1_chunked(q, p):
    """Shared body of the boundary-half 1-NN: chunked exact 1-NN of the
    (padded) query rows into the (sentinel-padded) boundary cloud.

    Candidate selection on TPU uses ``lax.approx_max_k`` (the PartialReduce
    unit) instead of ``lax.top_k``: top_k lowers to a full bitonic sort over
    the 20k candidate lanes and measured 72 ms/scan chained at the production
    shape [106k x 20k]; approx selection retains each reduction bin's MAXIMUM,
    so the top-1 candidate — the only one this consumer needs — is guaranteed
    present in the candidate set, and the exact f32 delta re-score below makes
    the returned index/distance exact. The selection matrix ships bf16 by
    default at inference (halves the dominant [chunk, P] traffic; override
    with ``TGN_TPU_KNN_SEL=f32``), which weakens the guarantee to
    exact-up-to-bf16-near-ties in candidate MEMBERSHIP — the same documented
    caveat as the purity query's nn1 (postprocess/boundary.py), whose output
    this merges with."""
    import os

    q = q[:, :3].astype(jnp.float32)  # accept a [Npad,6] (maybe f16) buffer
    p = p.astype(jnp.float32)
    pn = jnp.sum(p * p, axis=-1)
    approx = jax.default_backend() in ("tpu", "axon")
    sel_bf16 = approx and os.environ.get("TGN_TPU_KNN_SEL", "auto") != "f32"

    def chunk(qc):
        d2 = (jnp.sum(qc * qc, -1, keepdims=True)
              - 2.0 * jnp.matmul(qc, p.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + pn[None, :])
        if approx:
            sel = (-d2).astype(jnp.bfloat16) if sel_bf16 else -d2
            _, cand = jax.lax.approx_max_k(sel, 8, recall_target=0.95)
        else:
            _, cand = jax.lax.top_k(-d2, 4)          # [C, 4]
        delta = qc[:, None, :] - jnp.take(p, cand.reshape(-1), axis=0
                                          ).reshape(cand.shape + (3,))
        d2x = jnp.sum(delta * delta, -1)
        best = jnp.argmin(d2x, -1)
        idx = jnp.take_along_axis(cand, best[:, None], -1)[:, 0]
        dd = jnp.take_along_axis(d2x, best[:, None], -1)[:, 0]
        return idx.astype(jnp.int32), dd

    qs = q.reshape(-1, 4096, 3)
    idx, dd = jax.lax.map(chunk, qs)
    return idx.reshape(-1), dd.reshape(-1)


def _bdl_nn1_sel_fn(org_pad, sel, n_bd, num_bdl: int):
    """Zero-row-upload variant of :func:`_bdl_nn1_fn`: the boundary cloud is
    gathered IN-PROGRAM from the resident padded org upload via the
    ``device_ctx['bdl_sel']`` row index (first ``num_bdl`` entries are the
    boundary half; rows >= ``n_bd`` get the 1e6 sentinel so they never win).
    Upload per scan: the [24000] i32 sel plane (~96 KB, shared with the fused
    bdl forward) instead of the [20000, 3] f32 boundary rows (~240 KB)."""
    global _bdl_nn1_sel_jit
    if _bdl_nn1_sel_jit is None:
        from functools import partial

        @partial(jax.jit, static_argnames=("num_bdl",))
        def fn(org_pad, sel, n_bd, num_bdl):
            rows = jnp.take(org_pad[:, :3], sel[:num_bdl],
                            axis=0).astype(jnp.float32)
            live = jnp.arange(num_bdl) < n_bd
            p = jnp.where(live[:, None], rows, 1e6)
            return _nn1_chunked(org_pad, p)

        _bdl_nn1_sel_jit = fn
    return _bdl_nn1_sel_jit(org_pad, sel, jnp.int32(n_bd), num_bdl=num_bdl)


def _bdl_nn1_win_fn(org_pad, sel, n_bd, n_valid, num_bdl: int,
                    qorder=None, ax=None, win_frac: int | None = None):
    """Axis-windowed variant of :func:`_bdl_nn1_sel_fn` — same contract
    ``(idx [Npad] into the boundary cloud, d2 [Npad])``, with the [Npad, P]
    distance work cut to a 5/16 window (the same slab scheme as
    ``postprocess.boundary._purity_window_fn``; ``qorder``/``ax`` reuse the
    fused-FPS partition's argsort of the padded org buffer when provided).

    Exactness: the re-scored d2 is exact f32 for the returned candidate;
    candidate membership carries the bf16-selection near-tie caveat PLUS the
    window bound. Windows are VALUE-aligned (r5): each query slab's window is
    centered on the boundary rows nearest in axis value to the slab's median
    query, so a boundary cloud concentrated in one axis region (the round-4
    advisor's skew scenario) still gets on-target windows. For the vertices
    where the boundary half can actually win the final transfer
    (d_b < d_sampled ~ the sampled-cloud spacing), the true winner is within
    that spacing of the query and thus inside the centered window except under
    implausible axis-density pathologies (contract-tested vs the KD-tree on
    band-shaped AND skewed boundaries, tests/test_tgn_pipeline.py)."""
    global _bdl_nn1_win_jit
    if _bdl_nn1_win_jit is None:
        from functools import partial

        from ..ops.gather import index_points

        @partial(jax.jit, static_argnames=("num_bdl", "win_frac"))
        def fn(org_pad, sel, n_bd, n_valid, qorder, ax, num_bdl, win_frac):
            org = org_pad[:, :3].astype(jnp.float32)
            npad = org.shape[0]
            ns = 16
            chunk_pad = npad // ns
            win_w = min(num_bdl, -(-num_bdl * win_frac // ns))

            brows = jnp.take(org, sel[:num_bdl], axis=0)     # [P, 3]
            live = jnp.arange(num_bdl) < n_bd
            if ax is None:
                ax = jnp.argmax(jnp.var(brows, axis=0)).astype(jnp.int32)
            bval = jnp.where(live, jnp.take(brows, ax, axis=1), jnp.inf)
            border = jnp.argsort(bval).astype(jnp.int32)     # dead rows last
            rows_s = jnp.take(brows, border, axis=0)
            live_s = jnp.take(live, border)
            rows_s = jnp.where(live_s[:, None], rows_s, 1e6)
            bval_s = jnp.take(bval, border)                  # ascending, inf tail

            i = jnp.arange(npad, dtype=jnp.int32)
            if qorder is None:
                key = jnp.where(i < n_valid, jnp.take(org, ax, axis=1),
                                jnp.inf)
                qorder = jnp.argsort(key).astype(jnp.int32)
            chunk_len = (n_valid + ns - 1) // ns
            slab = i // chunk_len
            pos = i - slab * chunk_len
            qrows = jnp.take(org, qorder, axis=0)

            # VALUE-aligned window starts (round-4 advisor: quantile-aligned
            # windows lose when the boundary cloud's axis distribution is
            # skewed vs the org cloud — e.g. boundary concentrated in one
            # region pointed high-value query slabs at low-value windows).
            # Each query slab's window is centered, by searchsorted, on the
            # live boundary rows nearest IN AXIS VALUE to the slab's median
            # query; n_bd stays dynamic (dead rows sort to the inf tail).
            qvals = jnp.take(qrows, ax, axis=1)              # sorted (live asc)
            mid_pos = jnp.minimum(
                jnp.arange(ns, dtype=jnp.int32) * chunk_len + chunk_len // 2,
                jnp.maximum(n_valid - 1, 0))
            qmid = jnp.take(qvals, mid_pos)                  # [ns]
            starts = jnp.clip(
                jnp.searchsorted(bval_s, qmid).astype(jnp.int32) - win_w // 2,
                0, jnp.maximum(n_bd - win_w, 0))
            win = jnp.stack([jax.lax.dynamic_slice(
                rows_s, (starts[s], 0), (win_w, 3)) for s in range(ns)])
            q = jnp.zeros((ns, chunk_pad, 3), jnp.float32
                          ).at[slab, pos].set(qrows, mode="drop")
            qgidx = jnp.full((ns, chunk_pad), npad, jnp.int32
                             ).at[slab, pos].set(qorder, mode="drop")

            # batched chunked d2 + approx top-8 (bf16 selection) + re-score
            import os

            sel_bf16 = os.environ.get("TGN_TPU_KNN_SEL", "auto") != "f32"
            wn = win.astype(jnp.float32)
            w2 = jnp.sum(wn * wn, axis=-1)                   # [ns, W]

            def chunk(args):
                qc, wc, w2c = args                           # [ns, C, 3] ...
                d2 = (jnp.sum(qc * qc, -1, keepdims=True)
                      - 2.0 * jnp.einsum(
                          "scj,swj->scw", qc, wc,
                          precision=jax.lax.Precision.HIGHEST)
                      + w2c[:, None, :])
                sd = (-d2).astype(jnp.bfloat16) if sel_bf16 else -d2
                _, cand = jax.lax.approx_max_k(sd, 8, recall_target=0.95)
                cx = index_points(wc, cand)                  # [ns, C, 8, 3]
                delta = qc[:, :, None, :] - cx
                d2x = jnp.sum(delta * delta, -1)
                best = jnp.argmin(d2x, -1)
                idx = jnp.take_along_axis(cand, best[..., None], -1)[..., 0]
                dd = jnp.take_along_axis(d2x, best[..., None], -1)[..., 0]
                return idx.astype(jnp.int32), dd

            n_ch = 4 if chunk_pad % 4 == 0 else 1  # chunk_pad is a multiple
            csz = chunk_pad // n_ch                # of 512 (npad of 8192s)
            qs = jnp.moveaxis(q.reshape(ns, n_ch, csz, 3), 1, 0)
            wrep = jnp.broadcast_to(win[None], (n_ch,) + win.shape)
            w2rep = jnp.broadcast_to(w2[None], (n_ch,) + w2.shape)
            idx_l, dd = jax.lax.map(chunk, (qs, wrep, w2rep))
            idx_l = jnp.moveaxis(idx_l, 0, 1).reshape(ns, chunk_pad)
            dd = jnp.moveaxis(dd, 0, 1).reshape(ns, chunk_pad)

            # window-local -> boundary-cloud numbering (position in sel[:P])
            bidx = jnp.take(border, starts[:, None] + idx_l)

            flat = qgidx.reshape(-1)
            out_i = jnp.zeros((npad,), jnp.int32).at[flat].set(
                bidx.reshape(-1), mode="drop")
            out_d = jnp.full((npad,), 1e30, jnp.float32).at[flat].set(
                dd.reshape(-1), mode="drop")
            return out_i, out_d

        _bdl_nn1_win_jit = fn
    if ax is not None:
        ax = jnp.int32(ax)
    if win_frac is None:
        from ..postprocess.boundary import _win_frac

        win_frac = _win_frac()
    return _bdl_nn1_win_jit(org_pad, sel, jnp.int32(n_bd), jnp.int32(n_valid),
                            qorder, ax, num_bdl=num_bdl, win_frac=win_frac)


def _bdl_nn1_fn(org_pad, bdl_pad):
    """Exact 1-NN of every (padded) org vertex into the (padded) boundary
    cloud, on device: ``[Npad, 3] x [P, 3] -> (idx [Npad], d2 [Npad])``.

    Replaces the final transfer's host ``cKDTree(bdl_xyz).query(org)`` (~60-90
    ms of single-core host time per scan) with ~10-20 ms of MXU distances,
    reusing the org upload already resident from the purity query
    (postprocess/boundary.py:_boundary_purity device_ctx). Chunked 4096 query
    rows per ``lax.map`` step to bound the [chunk, P] distance tile; the
    expansion-form distances pick top-4 candidates and a delta-form re-score
    fixes near-tie ordering (same exactness scheme as _purity_device_fn).
    Sentinel-padded bdl rows (1e6) never win. Jitted once at module scope —
    one executable per (Npad bucket, P) pair."""
    global _bdl_nn1_jit
    if _bdl_nn1_jit is None:
        _bdl_nn1_jit = jax.jit(_nn1_chunked)
    return _bdl_nn1_jit(org_pad, bdl_pad)


def _device_votes(sem2, crop_idx, crop_valid, n_points: int):
    """Device-side crop-vote aggregation (same contract as
    ``_aggregate_crop_votes``): scatter-add each valid crop's FG/BG logits onto
    its source points, argmax. Runs INSIDE the stage-2 program so the pipeline
    fetches one [N] uint8 mask (24 KB) instead of the [16, crop_size, 2] logit
    tensor (plus saves the host add.at loop, which runs under the GIL during
    ``run_many`` overlap)."""
    w = crop_valid[:, None, None].astype(jnp.float32)
    contrib = (sem2.astype(jnp.float32) * w).reshape(-1, 2)
    votes = jnp.zeros((n_points, 2), jnp.float32
                      ).at[crop_idx.reshape(-1)].add(contrib)
    return jnp.argmax(votes, axis=1).astype(jnp.uint8)


_final_transfer_jit = None
_final_transfer_nob_jit = None


def _final_transfer_fns():
    """Device final 1-NN transfer: combine the purity query's exact
    org->sampled 1-NN with the boundary-half 1-NN (``_bdl_nn1_fn``) and gather
    the fused labels — all on device, so the pipeline fetches two [Npad] uint8
    planes (~200 KB) instead of the i32 index + f32 distance pair (~800 KB)
    plus host ``where``/gathers. ``label_pad`` rows: [0:n_sampled] stage-1
    labels, [n_sampled:] boundary-cluster labels (mod_ps/mod_sem order —
    matching the host route's ``concat([ins_labels, mod_ps])[nn]``). Ties
    (d_b2 == nn1_d2) resolve to the sampled side, same as the host route."""
    global _final_transfer_jit, _final_transfer_nob_jit
    if _final_transfer_jit is None:
        def full(nn1, nn1_d2, nn_b, d_b2, ins_pad, sem_pad, n_sampled):
            nn = jnp.where(d_b2 < nn1_d2, n_sampled + nn_b, nn1)
            return jnp.take(ins_pad, nn), jnp.take(sem_pad, nn)

        def nob(nn1, ins_pad, sem_pad):
            return jnp.take(ins_pad, nn1), jnp.take(sem_pad, nn1)

        _final_transfer_jit = jax.jit(full)
        _final_transfer_nob_jit = jax.jit(nob)
    return _final_transfer_jit, _final_transfer_nob_jit


class TgnInferencePipeline:
    def __init__(self, fps_ckpt: str, bdl_ckpt: str, config=None,
                 bdl_arch: dict | None = None, n_sample: int = N_SAMPLE,
                 boundary_info: dict | None = None,
                 inject_modules: tuple | None = None):
        from ..models import get_task
        from ..train.checkpoints import load_weights
        from ..utils.compile_cache import ensure_compile_cache

        import copy

        ensure_compile_cache()  # TPU-only persistent XLA cache (warm starts)
        task = get_task("tgnet_fps")
        cfg = copy.deepcopy(config) if config else task.default_config()
        # super-row attention gathers (ops/cells.py): measured SLOWER than the
        # XLA gathers at the flagship shapes (bdl 42.6 -> 75.8 ms, fps 71.1 ->
        # 92.1 ms — the one-hot select matmuls cost more than the row gathers
        # they replace at bf16), so OFF by default; the machinery stays tested
        # and opt-in via model_parameter for larger-k/wider-C regimes. The
        # pipeline still spatially sorts its clouds (harmless, and required
        # if the flag is enabled).
        cfg.model_parameter.setdefault("cell_attention", False)
        self.crop_size = cfg.model_parameter.get("crop_sample_size", 3072)
        self.n_sample = n_sample
        # boundary_sampling_info defaults (train_configs/tgnet_bdl.py:40-44)
        self.boundary_info = boundary_info or {
            "bdl_ratio": 0.7, "num_of_bdl_points": 20000,
            "num_of_all_points": n_sample}
        # _bdl_nn1_sel_fn slices sel[:num_bdl] and masks with a [num_bdl]
        # live plane — with num_bdl > num_all the broadcast fails at trace
        # time with an opaque shape error; fail clearly here instead
        # (round-3 advisor item; the reference's configs always satisfy it:
        # 20000 boundary of a 24000 cloud)
        assert (self.boundary_info["num_of_bdl_points"]
                <= self.boundary_info["num_of_all_points"]), (
            "boundary_info: num_of_bdl_points must be <= num_of_all_points "
            f"(got {self.boundary_info})")

        if inject_modules is not None:
            # dependency injection (whole-pipeline parity tests drive every
            # host/device algorithm with structured stand-in predictors):
            # (fps_module, fps_vars, bdl_module, bdl_vars) replace the built
            # modules and checkpoint loading; stage jits below resolve
            # methods on type(module), so any .stage1/.stage2 module works
            (self.fps_module, self.fps_vars,
             self.bdl_module, self.bdl_vars) = inject_modules
        else:
            self.fps_module = task.build_module(cfg)
            # bdl module arch (train_configs/tgnet_bdl.py model_parameter)
            bdl_arch = dict(bdl_arch or dict(planes=(16, 32), stride=(1, 1),
                                             nsample=(36, 24), blocks=(2, 3),
                                             block_num=2))
            bdl_arch.setdefault("cell_attention",
                                cfg.model_parameter["cell_attention"])
            self.bdl_module = TGNet(crop_size=self.crop_size, c=6, **bdl_arch)
        self._spatial_sort = bool(cfg.model_parameter["cell_attention"])

        key = jax.random.PRNGKey(0)
        if inject_modules is None:
            feat = jnp.zeros((1, n_sample, 6), jnp.float32)
            labels = jnp.zeros((1, n_sample), jnp.int32)
            init = jax.jit(self.fps_module.init, static_argnames=("train",))
            fps_vars = init(key, feat, None, train=False, labels=labels)
            self.fps_vars = load_weights(fps_ckpt, dict(fps_vars))
            init_b = jax.jit(self.bdl_module.init, static_argnames=("train",))
            bdl_vars = init_b(key, feat, None, train=False, labels=labels)
            self.bdl_vars = load_weights(bdl_ckpt, dict(bdl_vars))

        def stage1(module, variables, feats):
            # method resolved on the module's own class: TGNet in production,
            # the structured FakeTGNet in the whole-pipeline parity test
            out = module.apply(variables, feats, None,
                               method=type(module).stage1)
            # every host consumer takes argmax of the semantics (clustering,
            # crop centroids, final labels) — fetching uint8 class ids moves
            # 24 KB through the tunnel instead of the 960 KB logit tensor;
            # the offsets ship pre-added (moved = xyz + offset) because the
            # host only ever clusters the MOVED points
            cls = jnp.argmax(out["sem_1"], -1).astype(jnp.uint8)
            # f16 fetch: moved only feeds host DBSCAN/MeanShift (eps=.03,
            # bandwidth .07) — f16's ~5e-4 resolution at unit scale is 60x
            # below eps; halves the 288 KB plane through the ~16-30 MB/s tunnel
            moved = (feats[..., :3] + out["offset_1"]).astype(jnp.float16)
            return cls, moved

        def stage2(module, variables, feats, cents, valid):
            # crops built IN the same program: a separate make_crops dispatch
            # costs an extra ~25 ms tunnel round trip per stage. Vote
            # aggregation also on-device: one [N] int32 fetch.
            crops, crop_mask, crop_idx, _ = make_crops(
                feats, cents, valid, self.crop_size, sel_bf16=True)
            out = module.apply(variables, crops, crop_mask,
                               method=type(module).stage2)
            return _device_votes(out["sem_1"], crop_idx[0], valid[0],
                                 feats.shape[1])

        def bdl_fused(feats, cents, valid):
            # The bdl model's crop centroids come from the HOST-known pseudo
            # labels (not from its stage-1 output), so stage 1 + crops +
            # stage 2 + votes fuse into ONE dispatch with one fetch — the
            # two-dispatch structure the fps model needs (host DBSCAN between
            # stages) is pure overhead here (~2 tunnel round trips saved).
            out1 = self.bdl_module.apply(self.bdl_vars, feats, None,
                                         method=type(self.bdl_module).stage1)
            # f16 fetch: moved only feeds the host KMeans instancing
            moved = (feats[0, :, :3] + out1["offset_1"][0]
                     ).astype(jnp.float16)
            whole_mask = stage2(self.bdl_module, self.bdl_vars, feats,
                                cents, valid)
            return moved, whole_mask

        def bdl_fused_sel(org_pad, sel, cents, valid):
            # zero-row-upload variant: the boundary cloud is gathered
            # in-program from the resident padded org upload via the
            # device_ctx['bdl_sel'] index (~96 KB upload, shared with the
            # boundary-half 1-NN) instead of re-uploading the 576 KB rows
            feats = jnp.take(org_pad, sel, axis=0
                             )[None].astype(jnp.float32)
            return bdl_fused(feats, cents, valid)

        self._fps_stage1 = jax.jit(
            lambda f: stage1(self.fps_module, self.fps_vars, f))
        self._fps_stage2 = jax.jit(
            lambda f, c, v: stage2(self.fps_module, self.fps_vars, f, c, v))
        self._bdl_fused = jax.jit(bdl_fused)
        self._bdl_fused_sel = jax.jit(bdl_fused_sel)

        # Per-phase wall time of the LAST COMPLETED __call__, seconds
        # (SURVEY.md §5 tracing/profiling — the reference pipeline has no
        # observability; its known-slow spots are
        # inference_pipeline_tgn.py:26,43). Each __call__ accumulates into its
        # OWN local dict and publishes it here on completion, so concurrent
        # run_many scans cannot interleave phase times into one dict.
        self.timings: dict[str, float] = defaultdict(float)

    @staticmethod
    def _t(timings: dict, name: str, t0: float) -> float:
        now = time.perf_counter()
        timings[name] += now - t0
        return now

    def variants(self) -> dict:
        """Which kernel/algorithm variant each jitted program will actually
        take under the CURRENT env + backend — the bench harness logs this so
        isolated kernel A/Bs can be reconciled with the driver-captured e2e
        number (round-4 verdict weak item 1: ~100 ms of claimed chained-A/B
        cuts were invisible in BENCH_r04, and nothing recorded whether the new
        paths were even on-path). Derived from the same gate functions the
        traces call, at the flagship shapes."""
        import os as _os

        from ..models.point_transformer.backbone import _attention_mode
        from ..ops.knn import _use_approx_topk

        n = self.n_sample
        cs = self.crop_size
        approx = _use_approx_topk()
        win_stage = (_os.environ.get("TGN_TPU_STAGE_KNN", "flat")
                     == "window") and approx
        return {
            # per-shape eval attention dispatch (b, n, k, c)
            "attn_stage0_24k": _attention_mode(False, 1, n, 36, 32),
            "attn_crops_fps_s0": _attention_mode(False, K_MAX, cs, 36, 32),
            "attn_crops_bdl_s0": _attention_mode(False, K_MAX, cs, 36, 16),
            "attn_crops_bdl_s1": _attention_mode(False, K_MAX, cs, 24, 32),
            "stage_self_knn_24k": "window" if (win_stage and n % 16 == 0)
                                  else ("approx" if approx else "exact"),
            "stage_self_knn_crops": "window" if (win_stage and cs % 16 == 0)
                                    else ("approx" if approx else "exact"),
            "purity": _os.environ.get("TGN_TPU_PURITY", "window"),
            "bdl_nn1": _os.environ.get("TGN_TPU_BDLNN1", "window"),
            "win_frac": _os.environ.get("TGN_TPU_WIN_FRAC", "5"),
            "knn_sel": _os.environ.get("TGN_TPU_KNN_SEL", "auto"),
            "fps_kernel": _os.environ.get("TGN_TPU_KERNELS", "auto"),
            "fps_fold": _os.environ.get("TGN_TPU_FPS_FOLD", "1"),
            "upload": _os.environ.get("TGN_TPU_UPLOAD", "f16"),
            "knn": _os.environ.get("TGN_TPU_KNN", "auto"),
        }

    # ------------------------------------------------------------------
    def _run_fps_stage(self, feats_dev, sample_idx, crop_centroids_from,
                       timings: dict):
        """fps-model stage runner: stage-1 forward + fetch (the host DBSCAN
        between the stages forces this sync point), host centroids, then the
        stage-2 program (crops + forward + on-device vote aggregation) with a
        single [N] uint8 fetch.

        ``feats_dev`` is the DEVICE-resident sampled cloud ([n, 6], from
        ``fps_sample_dev``); ``sample_idx`` is ``(idx_dev, finalize,
        src_feats)`` — the host copy is reconstructed as
        ``src_feats[finalize(idx)]`` so the fetch moves the ~100 KB index
        instead of the 576 KB rows (None falls back to fetching the rows)."""
        t0 = time.perf_counter()
        feats = feats_dev[None]
        cls_1, moved = self._fps_stage1(feats)
        # sub-split keys ("phase/part") let the driver-captured wall phases be
        # reconciled against chained device numbers: dispatch ≈ host tracing +
        # enqueue RTT, fetch = sync on (queued device work + fetch bytes)
        td = self._t(timings, "fps:stage1_device/dispatch", t0)
        # ONE device_get: each separate np.asarray pays a ~25 ms tunnel RTT
        if sample_idx is not None:
            idx_dev, finalize, src_feats = sample_idx
            idx_np, cls_1, moved = jax.device_get((idx_dev, cls_1[0],
                                                   moved[0]))
            td = self._t(timings, "fps:stage1_device/fetch", td)
            feats_np = src_feats[finalize(np.asarray(idx_np))]
        else:
            feats_np, cls_1, moved = jax.device_get(
                (feats_dev, cls_1[0], moved[0]))
            td = self._t(timings, "fps:stage1_device/fetch", td)
            feats_np = np.asarray(feats_np)
        cls_1 = cls_1.astype(np.int32)
        moved = np.asarray(moved, np.float32)  # f16 tunnel fetch -> host f32
        t0 = self._t(timings, "fps:stage1_device", t0)
        xyz = feats_np[:, :3]
        centroids = crop_centroids_from(cls_1, moved, xyz)
        t0 = self._t(timings, "fps:host_centroids", t0)
        cents, valid, _ = _pad_centroids(centroids)
        fut2 = self._fps_stage2(feats, cents, valid)
        td = self._t(timings, "fps:stage2_device/dispatch", t0)
        whole_mask = np.asarray(jax.device_get(fut2))
        self._t(timings, "fps:stage2_device/fetch", td)
        self._t(timings, "fps:stage2_device", t0)
        return feats_np, cls_1, moved, whole_mask

    def run_many(self, stl_paths, workers: int = 3,
                 prep_workers: int | None = None):
        """Overlapped multi-scan inference: ``workers`` scans in flight so one
        scan's host phases (clustering, boundary resample, fusion) run while
        another's device stages occupy the TPU; mesh prep (obj parse, dedup,
        normals — the heaviest pure-host phase) can additionally be PREFETCHED
        in ``prep_workers`` spawned worker processes (true parallelism past
        the GIL; workers import only the JAX-free ``data.scan_prep`` module so
        they never touch the TPU). ``prep_workers`` defaults to
        ``cpu_count - 1``: on a single-core host extra processes only add IPC
        + spawn cost (measured 2.5 s/scan vs 1.0 thread-only), so the pool is
        used only when spare cores exist. The pool PERSISTS on the pipeline
        across calls (spawn+import costs ~2 s/worker — amortized, not paid per
        batch); call ``close()`` to reap it. Returns results in input order.

        The reference pipeline is strictly serial per scan
        (inference_pipeline_tgn.py:20-60); this is the TPU-serving analog of
        its batch loop. ``self.timings`` reflects the last COMPLETED scan.
        """
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        if prep_workers is None:
            prep_workers = max(0, min(2, (_os.cpu_count() or 1) - 1))
        if prep_workers <= 0:
            with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
                return list(ex.map(self, stl_paths))

        pp = self._prep_pool(prep_workers)
        futs = [pp.submit(prep_scan_host_tgn, p, self.n_sample)
                for p in stl_paths]
        with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
            return list(ex.map(
                lambda pf: self(pf[0], _prep=pf[1].result()),
                zip(stl_paths, futs)))

    def _prep_pool(self, prep_workers: int):
        """Persistent spawn-context prep pool, warmed on first use (the
        workers' numpy/scipy imports happen at warmup, not under the first
        batch's timing)."""
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        pool = getattr(self, "_pool", None)
        if pool is not None and self._pool_size == prep_workers:
            return pool
        self.close()
        ctx = mp.get_context("spawn")  # fork would clone the TPU client state
        pool = ProcessPoolExecutor(prep_workers, mp_context=ctx)
        from ..data import scan_prep
        list(pool.map(scan_prep.warm_worker, range(prep_workers)))
        self._pool, self._pool_size = pool, prep_workers
        return pool

    def close(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __call__(self, stl_path: str, _prep=None) -> dict:
        timings: dict[str, float] = defaultdict(float)
        t0 = time.perf_counter()
        # _prep: optional prefetched (org_feats, bdl_feats) from run_many's
        # worker processes; the device FPS sample always runs here
        org_feats, bdl_feats = _prep or prep_scan_host_tgn(stl_path,
                                                           self.n_sample)
        # device-resident buffers shared across the scan's dispatches (the
        # fused FPS stashes its padded upload; purity reuses it as the org
        # cloud and stashes its own outputs for the final transfer)
        device_ctx: dict = {}
        if self._spatial_sort:
            # sorted-cell locality for the super-row attention path needs a
            # host-side permutation of the sample — take the host FPS route
            sampled = fps_sample(bdl_feats, self.n_sample).astype(np.float32)
            from ..ops.cells import spatial_sort_perm

            sampled = sampled[spatial_sort_perm(sampled[:, :3])]
            feats_dev = jnp.asarray(sampled)
            sample_idx = None
        else:
            # device-resident FPS: selection + row gather in one dispatch;
            # the host copy is rebuilt from the ~100 KB sample INDEX (fetched
            # with stage-1's outputs) instead of fetching the 576 KB rows
            feats_dev, idx_dev, finalize = fps_sample_dev(
                bdl_feats, self.n_sample, return_idx=True, ctx=device_ctx)
            sample_idx = (idx_dev, finalize, bdl_feats)
        n_vertices = org_feats.shape[0]
        t0 = self._t(timings, "mesh_prep", t0)

        # ---------------- stage 1 (fps model) ----------------
        def fps_centroids(cls1, moved, xyz):
            fg_labels = get_clustering_labels(moved, cls1)
            fg_moved = moved[cls1 != 0]
            return [fg_moved[fg_labels == i].mean(axis=0)
                    for i in np.unique(fg_labels)]

        sampled, cls_1, moved, whole_mask = self._run_fps_stage(
            feats_dev, sample_idx, fps_centroids, timings)
        t0 = time.perf_counter()  # cls_1: half-arch 0..9

        # refined instancing from the vote-aggregated FG mask (:198-214)
        ins_labels = np.full(len(sampled), -1.0)
        if whole_mask.any():
            fg_ins = get_clustering_labels(moved, whole_mask)
            ins_labels[whole_mask != 0] = fg_ins
        ins_labels = (ins_labels + 1).astype(np.int64)  # 0 = bg
        t0 = self._t(timings, "host_instancing", t0)

        # ---------------- boundary stage (bdl model) ----------------
        bdl_sampled, pseudo_labels, n_bd, nn1_idx, nn1_d2 = \
            boundary_sampled_feats(
                ins_labels, bdl_feats, sampled,
                bdl_ratio=self.boundary_info["bdl_ratio"],
                num_bdl_points=self.boundary_info["num_of_bdl_points"],
                num_all_points=self.boundary_info["num_of_all_points"],
                spatial_sort=self._spatial_sort, return_nn1=True,
                device_ctx=device_ctx, sampled_xyz_dev=feats_dev,
                timings=timings)
        pseudo_in = pseudo_labels.astype(np.int64) - 1  # -1 = bg
        # boundary half of the final 1-NN transfer: dispatch NOW (device MXU,
        # reusing the purity query's resident org upload) so it overlaps the
        # host centroid/fusion work below; host cKDTree fallback otherwise
        nn1_b_fut = None
        # sel route: org_pad_dev is the 6-channel mesh-prep upload AND the
        # resample rows index it directly — the bdl cloud re-materializes on
        # device from the ~96 KB 'bdl_sel' index plane (uploaded once, shared
        # by the 1-NN below and the fused bdl forward)
        sel_dev = None
        if ("bdl_sel" in device_ctx and "feats_pad_dev" in device_ctx
                and device_ctx.get("org_pad_dev")
                is device_ctx["feats_pad_dev"]):
            sel_dev = jnp.asarray(device_ctx["bdl_sel"])
        num_bdl = self.boundary_info["num_of_bdl_points"]
        t_nn1 = time.perf_counter()
        if n_bd and "org_pad_dev" in device_ctx:
            import os as _os2

            if (sel_dev is not None
                    and _os2.environ.get("TGN_TPU_BDLNN1", "window")
                    == "window"
                    and device_ctx["org_pad_dev"].shape[0] % 16 == 0):
                # the fused-FPS argsort is only valid for ITS buffer (the sel
                # route already guarantees org_pad_dev is feats_pad_dev)
                same_buf = (device_ctx.get("feats_pad_dev")
                            is device_ctx["org_pad_dev"])
                nn1_b_fut = _bdl_nn1_win_fn(
                    device_ctx["org_pad_dev"], sel_dev, n_bd,
                    device_ctx.get("n_org",
                                   device_ctx["org_pad_dev"].shape[0]),
                    num_bdl,
                    qorder=(device_ctx.get("org_order_dev")
                            if same_buf else None),
                    ax=(device_ctx.get("org_order_ax")
                        if same_buf else None))
            elif sel_dev is not None:
                nn1_b_fut = _bdl_nn1_sel_fn(device_ctx["org_pad_dev"],
                                            sel_dev, n_bd, num_bdl)
            else:
                bdl_pad = np.full((num_bdl, 3), 1e6, np.float32)
                bdl_pad[:n_bd] = bdl_sampled[:n_bd, :3]
                nn1_b_fut = _bdl_nn1_fn(device_ctx["org_pad_dev"],
                                        jnp.asarray(bdl_pad))
        self._t(timings, "host_boundary_resample/bdlnn1_dispatch", t_nn1)
        t0 = self._t(timings, "host_boundary_resample", t0)

        # bdl crop centroids come from the pseudo labels (host-known BEFORE
        # the forward), so the whole bdl pass is one fused dispatch + fetch
        xyz_b = bdl_sampled[:, :3]
        bdl_cents = [xyz_b[pseudo_in == i].mean(axis=0)
                     for i in np.unique(pseudo_in) if i != -1]
        cents_b, valid_b, _ = _pad_centroids(bdl_cents)
        if sel_dev is not None:
            fut_b = self._bdl_fused_sel(
                device_ctx["org_pad_dev"], sel_dev, cents_b, valid_b)
        else:
            fut_b = self._bdl_fused(
                jnp.asarray(bdl_sampled[None]), cents_b, valid_b)
        td = self._t(timings, "bdl:fused_device/dispatch", t0)
        moved_b, whole_mask_b = jax.device_get(fut_b)
        self._t(timings, "bdl:fused_device/fetch", td)
        moved_b = np.asarray(moved_b, np.float32)
        whole_mask_b = np.asarray(whole_mask_b)
        t0 = self._t(timings, "bdl:fused_device", t0)

        n_clusters = len(np.unique(pseudo_in)) - 1
        bdl_ins = np.zeros(len(bdl_sampled)) - 1
        fg_b = whole_mask_b != 0
        if fg_b.any() and n_clusters >= 1:
            _, _, labels_ls = clustering_points(
                [moved_b[fg_b]], "kmeans", [n_clusters])
            bdl_ins[fg_b] = labels_ls[0]
        bdl_ins = (bdl_ins + 1).astype(np.int64)
        t0 = self._t(timings, "host_bdl_kmeans", t0)

        # ---------------- fusion ----------------
        first_xyz = sampled[:, :3]
        new_sem = disambiguate_arch_labels(first_xyz, ins_labels, cls_1)
        bdl_xyz = bdl_sampled[:n_bd, :3]
        bdl_ps = bdl_ins[:n_bd]
        mod_ps, mod_sem = merge_boundary_clusters(
            first_xyz, ins_labels, new_sem, bdl_xyz, bdl_ps)

        final_ins = np.concatenate([ins_labels, mod_ps], axis=0)
        final_sem = np.concatenate([new_sem, mod_sem], axis=0)
        t0 = self._t(timings, "host_fusion", t0)

        # ---------------- 1-NN transfer + FDI remap ----------------
        # Decomposed 1-NN over the concat (same minimum, up to exact-distance
        # tie-breaks): the org->SAMPLED half is the purity query's exact nn1
        # byproduct. On the device path BOTH halves live on device already
        # (purity nn1 + the early-dispatched boundary 1-NN), so the combine +
        # label gather run there too and the pipeline fetches two [Npad]
        # uint8 planes (~200 KB) instead of the i32/f32 pair (~800 KB) plus
        # host where/gathers. Host route: KD-tree over only the <=20k
        # boundary points instead of the 44k concat (the full-concat tree was
        # 75-150 ms of single-core host time per scan; a flat device MXU
        # variant measured 143 ms at [100k x 48k] — trees prune too well)
        if "nn1_dev" in device_ctx:
            num_bdl = self.boundary_info["num_of_bdl_points"]
            ins_pad = np.zeros(len(first_xyz) + num_bdl, np.uint8)
            sem_pad = np.zeros_like(ins_pad)
            ins_pad[:len(final_ins)] = final_ins
            sem_pad[:len(final_sem)] = final_sem
            full_fn, nob_fn = _final_transfer_fns()
            if nn1_b_fut is not None:
                res = full_fn(device_ctx["nn1_dev"],
                              device_ctx["nn1_d2_dev"],
                              nn1_b_fut[0], nn1_b_fut[1],
                              jnp.asarray(ins_pad), jnp.asarray(sem_pad),
                              jnp.int32(len(first_xyz)))
            else:
                res = nob_fn(device_ctx["nn1_dev"], jnp.asarray(ins_pad),
                             jnp.asarray(sem_pad))
            td = self._t(timings, "host_1nn_transfer/dispatch", t0)
            result_ins, result_sem = jax.device_get(res)
            self._t(timings, "host_1nn_transfer/fetch", td)
            result_ins = result_ins[:n_vertices].astype(np.int64)
            result_sem = result_sem[:n_vertices].astype(np.int64)
        else:
            nn = nn1_idx[:n_vertices].astype(np.int64)
            if n_bd:
                from scipy.spatial import cKDTree

                d_b, nn_b = cKDTree(bdl_xyz).query(org_feats[:, :3], k=1,
                                                   workers=-1)
                use_b = (d_b ** 2) < nn1_d2[:n_vertices]  # ties -> sampled
                nn = np.where(use_b, len(first_xyz) + nn_b, nn)
            result_ins = final_ins[nn.reshape(-1)]
            result_sem = final_sem[nn.reshape(-1)].copy()
        result_sem[result_sem >= 9] += 2
        result_sem[result_sem > 0] += 10
        self._t(timings, "host_1nn_transfer", t0)
        self.timings = timings
        assert result_sem.shape[0] == n_vertices
        assert result_ins.shape[0] == n_vertices
        return {"sem": result_sem.reshape(-1), "ins": result_ins.reshape(-1)}
