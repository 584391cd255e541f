"""Shared inference-time mesh preparation.

Reproduces the reference pipelines' prep (inference_pipeline_sem.py:17-28 /
inference_pipeline_tgn.py:24-43):
  * load mesh, center xyz by mean,
  * scale ALL axes by this scan's y-extent: ``(v − min(y)) / (max(y) − min(y)) *
    1.8 − 0.8`` (scaler/shifter constants, inference_pipeline_tgn.py:12-13) — note
    this deliberately differs from the fixed-constant normalization used in offline
    preprocessing,
  * midpoint-subdivide once if the mesh has <24k vertices,
  * FPS-sample exactly 24000 points of xyz+normal features.

Device boundary design (SURVEY.md §2.8): prep is host numpy except FPS (device);
model forwards are single jitted calls; clustering/fusion is host-side postprocess.
"""

from __future__ import annotations

import numpy as np

from ..data.mesh_io import compute_vertex_normals, parse_obj, subdivide_midpoint
from ..data.scan_prep import N_SAMPLE, SCALER, SHIFTER, normalize_scan_vertices


def prep_mesh_feats(stl_path: str, n_sample: int = N_SAMPLE):
    """Host mesh prep WITHOUT the FPS step: returns ``(org_feats [N0,6],
    feats [N,6])`` — original-vertex features (pre-subdivision, the 1-NN
    upsample targets) and the (possibly subdivided) FPS source cloud."""
    vertices, faces = parse_obj(stl_path)
    vertices = normalize_scan_vertices(vertices)

    normals = compute_vertex_normals(vertices, faces)
    org_feats = np.concatenate([vertices, normals], axis=1)

    if vertices.shape[0] < n_sample:
        vertices, faces = subdivide_midpoint(vertices, faces, 1)
        normals = compute_vertex_normals(vertices, faces)
    feats = np.concatenate([vertices, normals], axis=1)
    return org_feats.astype(np.float32), feats.astype(np.float32)


def prep_mesh(stl_path: str, n_sample: int = N_SAMPLE):
    """Returns ``(org_feats [N0,6], sampled_feats [n_sample,6])`` — original-vertex
    features (pre-subdivision, the 1-NN upsample targets) and the FPS-sampled model
    input."""
    org_feats, feats = prep_mesh_feats(stl_path, n_sample)
    return org_feats, fps_sample(feats, n_sample).astype(np.float32)


_FPS_BUCKET = 8192
_FPS_CHUNKS = 16          # spatial chunks for the two-level sampler
_FPS_CHUNKED_MIN = 32768  # below this the exact kernel is already fast


def _fps_sample_mode() -> str:
    import os

    return os.environ.get("TGN_FPS_SAMPLE", "auto")


def fps_sample_idx(xyz: np.ndarray, n: int) -> np.ndarray:
    """Device-FPS indices for a host cloud of ARBITRARY size.

    Dispatch (TGN_FPS_SAMPLE=auto|exact|chunked): large clouds on TPU use the
    two-level chunked sampler below — mesh-prep/resample FPS tolerates
    approximation (the reference itself FPS-samples once OFFLINE,
    preprocess_data.py:55-56; only the in-model TransitionDown FPS carries the
    CUDA seed contract, and that path never comes through here). Everything
    else runs the exact sequential kernel.

    Pads the point count up to a multiple of 8192 with a validity mask so that
    every scan size in a bucket shares ONE compiled executable — unbucketed,
    each new mesh size would trigger a fresh XLA compile (minutes through the
    tunneled chip; the scan sizes of a production stream are all distinct).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import farthest_point_sample

    n0 = xyz.shape[0]
    mode = _fps_sample_mode()
    if mode == "chunked" or (
            mode == "auto" and n0 >= _FPS_CHUNKED_MIN
            and jax.default_backend() in ("tpu", "axon")):
        return fps_sample_idx_chunked(xyz, n)

    n_pad = -(-n0 // _FPS_BUCKET) * _FPS_BUCKET
    pad = np.zeros((n_pad, 3), np.float32)
    pad[:n0] = xyz[:, :3]
    mask = np.zeros(n_pad, bool)
    mask[:n0] = True
    # bucket the sample count as well (it varies per scan too): FPS is greedy-
    # sequential, so the first n samples of an m-sample run ARE FPS(n)
    n_bucket = min(-(-n // 512) * 512, n0)
    idx = np.asarray(farthest_point_sample(
        jnp.asarray(pad), n_bucket, jnp.asarray(mask)))
    return idx[:n]


def fps_sample_idx_chunked(xyz: np.ndarray, n: int,
                           n_chunks: int = _FPS_CHUNKS) -> np.ndarray:
    """Two-level approximate FPS: sort by the highest-variance axis, split into
    ``n_chunks`` equal-count slabs, and run FPS on ALL slabs simultaneously
    with the sublane-multicloud Pallas kernel (ops/pallas/fps_kernel.py).

    The exact kernel is a sequential chain of n iterations (~9 us each on the
    v5e regardless of lane count) — 24k samples = ~210 ms/scan, the single
    largest end-to-end phase at round 2. Chunking divides the chain length by
    ``n_chunks`` (1500 iterations for 24k/16) while each iteration still
    advances every slab: ~16x faster. Within-slab selection is true FPS;
    cross-slab balance comes from equal-count slabs getting equal quotas.
    Samples interleave slab-major by selection rank, so a truncated prefix
    (the quota padding trim) drops the LAST-ranked samples of each slab
    evenly, preserving coverage.

    Shapes are bucketed (slab length to 512s, quota to 128s) so a production
    stream of distinct scan sizes shares compiled executables.
    """
    import jax.numpy as jnp

    from ..ops import farthest_point_sample

    xyz = np.ascontiguousarray(xyz[:, :3], np.float32)
    n0 = xyz.shape[0]
    assert n0 >= n, "caller guarantees n0 >= n (fps_sample repeats otherwise)"
    ax = int(np.argmax(xyz.var(axis=0)))
    order = np.argsort(xyz[:, ax], kind="stable")

    chunk_len = -(-n0 // n_chunks)
    chunk_pad = -(-chunk_len // 512) * 512
    quota = -(-n // n_chunks)
    quota_pad = min(-(-quota // 128) * 128, chunk_len)

    pts = np.zeros((n_chunks, chunk_pad, 3), np.float32)
    mask = np.zeros((n_chunks, chunk_pad), bool)
    starts = np.minimum(np.arange(n_chunks) * chunk_len, n0)
    ends = np.minimum(starts + chunk_len, n0)
    for c in range(n_chunks):
        m = ends[c] - starts[c]
        pts[c, :m] = xyz[order[starts[c]:ends[c]]]
        mask[c, :m] = True

    local = np.asarray(farthest_point_sample(
        jnp.asarray(pts), quota_pad, jnp.asarray(mask)))  # [n_chunks, quota_pad]
    global_idx = order[np.minimum(starts[:, None] + local, n0 - 1)]
    # interleave by selection rank: [quota_pad, n_chunks] -> flat -> trim
    return global_idx.T.reshape(-1)[:n]


def fps_sample(feats: np.ndarray, n: int) -> np.ndarray:
    """FPS down to n points (device op); pads by repeating points when fewer."""
    if feats.shape[0] <= n:
        reps = -(-n // feats.shape[0])
        return np.concatenate([feats] * reps, axis=0)[:n]
    return feats[fps_sample_idx(feats[:, :3], n)]


def _fps_gather_jits():
    """Module-scope jit cache for the device-resident samplers (a per-call
    ``jax.jit`` wrapper would recompile every scan — CLAUDE.md)."""
    global _FPS_DEV_EXACT, _FPS_DEV_CHUNKED, _FPS_DEV_FUSED
    if _FPS_DEV_EXACT is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        from ..ops import farthest_point_sample

        @partial(jax.jit, static_argnames=("n_bucket", "n"))
        def exact(fpad, mask, n_bucket, n):
            idx = farthest_point_sample(fpad[:, :3], n_bucket, mask)
            return jnp.take(fpad, idx[:n], axis=0), idx[:n]

        @partial(jax.jit, static_argnames=("quota_pad", "n"))
        def chunked(pts_feats, mask, quota_pad, n):
            local = farthest_point_sample(pts_feats[..., :3], quota_pad, mask)
            counts = jnp.sum(mask, axis=1).astype(jnp.int32)
            local = jnp.minimum(local, counts[:, None] - 1)  # short last slab
            g = jnp.take_along_axis(
                pts_feats, local[..., None].astype(jnp.int32), axis=1)
            # interleave by selection rank (matches fps_sample_idx_chunked's
            # global_idx.T.reshape(-1)[:n] trim semantics)
            return jnp.moveaxis(g, 0, 1).reshape(-1, g.shape[-1])[:n], local

        @partial(jax.jit, static_argnames=("quota_pad", "n", "n_chunks"))
        def fused(feats_pad, n0, ax, quota_pad, n, n_chunks):
            # also returns `order` (the stable valid-first argsort by axis
            # `ax`) — the windowed purity program slabs the SAME padded cloud
            # by the same key, so reusing this plane skips its own ~104k
            # argsort (stashed as device_ctx['org_order_dev'])
            feats_pad = feats_pad.astype(jnp.float32)  # accept an f16 upload
            # Device-side two-level FPS: the spatial partition (stable sort by
            # the host-chosen axis, equal-VALID-count slabs of
            # ceil(n0/n_chunks)) runs INSIDE the program, so the host uploads
            # the scan ONCE in original row order — no host argsort (~10 ms
            # GIL time/scan), no permuted padded copy, and the same buffer's
            # xyz prefix doubles as the purity query's org cloud (saves its
            # ~1.2 MB re-upload; see TgnInferencePipeline). Slab assignment,
            # quotas, and the rank interleave reproduce fps_sample_idx_chunked
            # exactly (contract-tested bit-identical).
            npad, f = feats_pad.shape
            chunk_pad = npad // n_chunks
            i = jnp.arange(npad, dtype=jnp.int32)
            key = jnp.where(i < n0, jnp.take(feats_pad, ax, axis=1), jnp.inf)
            order = jnp.argsort(key).astype(jnp.int32)  # stable: ties keep
            chunk_len = (n0 + n_chunks - 1) // n_chunks  # original order
            slab = i // chunk_len
            pos = i - slab * chunk_len
            srows = jnp.take(feats_pad, order, axis=0)
            pts = jnp.zeros((n_chunks, chunk_pad, f), feats_pad.dtype
                            ).at[slab, pos].set(srows, mode="drop")
            msk = jnp.zeros((n_chunks, chunk_pad), bool
                            ).at[slab, pos].set(i < n0, mode="drop")
            local = farthest_point_sample(pts[..., :3], quota_pad, msk)
            counts = jnp.sum(msk, axis=1).astype(jnp.int32)
            local = jnp.minimum(local, jnp.maximum(counts[:, None] - 1, 0))
            spos = (jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * chunk_len
                    + local)
            g = jnp.take(order, jnp.minimum(spos, npad - 1))
            rows = jnp.take(feats_pad, g, axis=0)        # [n_chunks, q, F]
            rows = jnp.moveaxis(rows, 0, 1).reshape(-1, f)[:n]
            gi = jnp.moveaxis(g, 0, 1).reshape(-1)[:n]
            return rows, gi, order

        _FPS_DEV_EXACT, _FPS_DEV_CHUNKED, _FPS_DEV_FUSED = \
            exact, chunked, fused
    return _FPS_DEV_EXACT, _FPS_DEV_CHUNKED, _FPS_DEV_FUSED


_FPS_DEV_EXACT = None
_FPS_DEV_CHUNKED = None
_FPS_DEV_FUSED = None


def fps_sample_dev(feats: np.ndarray, n: int, return_idx: bool = False,
                   ctx: dict | None = None):
    """``fps_sample`` that KEEPS the sampled rows on device: FPS selection and
    the row gather run in ONE jitted dispatch, returning a ``[n, F]`` device
    array with no index fetch. The tgn pipeline feeds it straight into the
    stage-1 program and fetches the host copy TOGETHER with stage-1's outputs
    — two tunnel round trips (idx fetch + sampled re-upload, ~25 ms each)
    fewer per scan than the host-numpy route. Same bucketing/dispatch rules
    as :func:`fps_sample_idx` (chunked two-level on large TPU clouds, exact
    elsewhere).

    With ``return_idx`` returns ``(feats_dev, idx_dev, finalize)`` where
    ``idx_dev`` is a small DEVICE int32 array and ``finalize(np_idx)`` maps
    its fetched value to GLOBAL row indices into ``feats``. The tgn pipeline
    fetches the ~100 KB index instead of the 576 KB sampled rows and
    reconstructs the host copy as ``feats[global_idx]`` (tunnel discipline:
    ~10-15 MB/s, every fetched MB is ~70-90 ms/scan)."""
    import jax
    import jax.numpy as jnp

    n0 = feats.shape[0]
    if n0 <= n:
        reps_idx = np.tile(np.arange(n0), -(-n // n0))[:n]
        dev = jnp.asarray(fps_sample(feats, n))
        if return_idx:
            return dev, jnp.asarray(reps_idx.astype(np.int32)), np.asarray
        return dev
    feats = np.ascontiguousarray(feats, np.float32)
    exact_fn, chunked_fn, fused_fn = _fps_gather_jits()
    mode = _fps_sample_mode()
    on_dev = jax.default_backend() in ("tpu", "axon")
    if mode in ("chunked", "fused") or (
            mode == "auto" and n0 >= _FPS_CHUNKED_MIN and on_dev):
        # fused device partition: ONE upload of the raw padded buffer; the
        # sort/slab/scatter happen in-program (see _fps_gather_jits.fused).
        # The padded buffer is stashed in ``ctx`` for downstream reuse (the
        # tgn pipeline's purity query reads its xyz prefix as the org cloud).
        # The upload ships f16 by default on TPU (TGN_TPU_UPLOAD=f32 opts
        # out): it halves the dominant ~2.5 MB/scan tunnel upload
        # (~16-30 MB/s), and the ~5e-4 quantization at unit scale is ~10x
        # below the ~0.005 vertex spacing of a 100k-vertex scan — every
        # device consumer casts back to f32 in-program, so all derived
        # quantities (FPS selection, purity ratio, nn1 d2 tie-breaks) are
        # internally consistent on the same quantized cloud.
        import os

        n_chunks = _FPS_CHUNKS
        ax = int(np.argmax(feats[:, :3].var(axis=0)))
        n_pad = -(-n0 // _FPS_BUCKET) * _FPS_BUCKET
        up_dt = (np.float16 if os.environ.get(
            "TGN_TPU_UPLOAD", "f16" if on_dev else "f32") == "f16"
            else np.float32)
        pad = np.zeros((n_pad, feats.shape[1]), up_dt)
        pad[:n0] = feats
        quota = -(-n // n_chunks)
        quota_pad = min(-(-quota // 128) * 128, -(-n0 // n_chunks))
        pad_dev = jnp.asarray(pad)
        dev, g_idx, order_dev = fused_fn(pad_dev, np.int32(n0), np.int32(ax),
                                         quota_pad=quota_pad, n=n,
                                         n_chunks=n_chunks)
        if ctx is not None:
            ctx["feats_pad_dev"] = pad_dev
            ctx["n_org"] = n0
            ctx["org_order_dev"] = order_dev   # stays device-resident
            ctx["org_order_ax"] = ax
        if return_idx:
            return dev, g_idx, np.asarray  # indices are already global
        return dev

    if mode == "chunked_host":
        n_chunks = _FPS_CHUNKS
        ax = int(np.argmax(feats[:, :3].var(axis=0)))
        order = np.argsort(feats[:, ax], kind="stable")
        chunk_len = -(-n0 // n_chunks)
        chunk_pad = -(-chunk_len // 512) * 512
        quota = -(-n // n_chunks)
        quota_pad = min(-(-quota // 128) * 128, chunk_len)
        f = feats.shape[1]
        pts = np.zeros((n_chunks, chunk_pad, f), np.float32)
        mask = np.zeros((n_chunks, chunk_pad), bool)
        starts = np.minimum(np.arange(n_chunks) * chunk_len, n0)
        ends = np.minimum(starts + chunk_len, n0)
        for c in range(n_chunks):
            m = ends[c] - starts[c]
            pts[c, :m] = feats[order[starts[c]:ends[c]]]
            mask[c, :m] = True
        dev, local = chunked_fn(jnp.asarray(pts), jnp.asarray(mask),
                                quota_pad=quota_pad, n=n)
        if return_idx:
            def finalize(local_np):  # [n_chunks, quota_pad] -> global [n]
                g = order[np.minimum(starts[:, None] + local_np, n0 - 1)]
                return g.T.reshape(-1)[:n]

            return dev, local, finalize
        return dev

    n_pad = -(-n0 // _FPS_BUCKET) * _FPS_BUCKET
    pad = np.zeros((n_pad, feats.shape[1]), np.float32)
    pad[:n0] = feats
    mask = np.zeros(n_pad, bool)
    mask[:n0] = True
    n_bucket = min(-(-n // 512) * 512, n0)
    dev, idx = exact_fn(jnp.asarray(pad), jnp.asarray(mask),
                        n_bucket=n_bucket, n=n)
    if return_idx:
        return dev, idx, np.asarray
    return dev


def nn_upsample(values: np.ndarray, source_xyz: np.ndarray,
                target_xyz: np.ndarray) -> np.ndarray:
    """1-NN label transfer from sampled points to all original vertices
    (inference_pipeline_sem.py:37-39 KDTree contract). Host KD-tree on
    purpose: measured 70 ms vs 143 ms for a device MXU brute-force variant at
    [100k x 48k] — low-dimensional trees prune too well to beat."""
    from scipy.spatial import cKDTree

    tree = cKDTree(source_xyz)
    _, nearest = tree.query(target_xyz, k=1, workers=-1)
    return np.asarray(values).reshape(-1)[nearest]


def class_logits_to_fdi(cls_ids: np.ndarray) -> np.ndarray:
    """Class ids 0..16 → FDI-without-jaw-offset (inference_pipeline_sem.py:33-34:
    ``>=9 → +2`` then ``>0 → +10``)."""
    out = np.asarray(cls_ids).copy()
    out[out >= 9] += 2
    out[out > 0] += 10
    return out
