"""Unit tests for the ops layer against brute-force numpy references.

Covers the contracts of the reference CUDA pointops kernels (SURVEY.md §2.1) and the
dense pointnet2_utils primitives (§2.2): FPS determinism + seed point, exact kNN,
ball-query lowest-index semantics, inverse-distance interpolation weights.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.ops import (
    square_distance,
    index_points,
    farthest_point_sample,
    knn_points,
    ball_query,
    knn_interpolate,
    sample_and_group,
)


def np_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def np_fps(xyz, m, valid=None):
    n = xyz.shape[0]
    if valid is None:
        valid = np.ones(n, bool)
    dist = np.where(valid, np.inf, -np.inf)
    idxs = np.zeros(m, np.int64)
    last = int(np.argmax(valid))
    idxs[0] = last
    for i in range(1, m):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        dist = np.minimum(dist, np.where(valid, d, -np.inf))
        last = int(np.argmax(dist))
        idxs[i] = last
    return idxs


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        a = rng.standard_normal((17, 3)).astype(np.float32)
        b = rng.standard_normal((29, 3)).astype(np.float32)
        got = np.asarray(square_distance(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(got, np_sqdist(a, b), atol=1e-4)

    def test_batched(self, rng):
        a = rng.standard_normal((2, 5, 3)).astype(np.float32)
        got = np.asarray(square_distance(jnp.array(a), jnp.array(a)))
        for i in range(2):
            np.testing.assert_allclose(got[i], np_sqdist(a[i], a[i]), atol=1e-4)
        assert (np.diagonal(got, axis1=1, axis2=2) < 1e-5).all()


class TestIndexPoints:
    def test_2d_idx(self, rng):
        pts = rng.standard_normal((2, 10, 4)).astype(np.float32)
        idx = rng.integers(0, 10, (2, 5))
        got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    def test_3d_idx(self, rng):
        pts = rng.standard_normal((2, 10, 4)).astype(np.float32)
        idx = rng.integers(0, 10, (2, 5, 3))
        got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])


class TestFPS:
    def test_matches_bruteforce(self, rng):
        xyz = rng.standard_normal((100, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 16))
        np.testing.assert_array_equal(got, np_fps(xyz, 16))

    def test_seeds_first_point(self, rng):
        xyz = rng.standard_normal((50, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 8))
        assert got[0] == 0

    def test_masked_never_selects_invalid(self, rng):
        xyz = rng.standard_normal((60, 3)).astype(np.float32)
        valid = np.ones(60, bool)
        valid[40:] = False
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 20, jnp.array(valid)))
        assert (got < 40).all()
        np.testing.assert_array_equal(got, np_fps(xyz, 20, valid))

    def test_masked_seed_is_first_valid(self, rng):
        xyz = rng.standard_normal((30, 3)).astype(np.float32)
        valid = np.ones(30, bool)
        valid[:5] = False
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 4, jnp.array(valid)))
        assert got[0] == 5

    def test_batched(self, rng):
        xyz = rng.standard_normal((3, 40, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 10))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], 10))

    def test_unique_when_enough_points(self, rng):
        xyz = rng.standard_normal((100, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 50))
        assert len(set(got.tolist())) == 50


class TestChunkedFPS:
    """Two-level approximate sampler (pipelines/base.py:fps_sample_idx_chunked)
    used for mesh-prep/resample FPS on large clouds."""

    def test_valid_unique_and_deterministic(self, rng):
        from toothgroupnetwork_tpu.pipelines.base import fps_sample_idx_chunked

        xyz = rng.standard_normal((40000, 3)).astype(np.float32)
        idx = fps_sample_idx_chunked(xyz, 2048)
        assert idx.shape == (2048,)
        assert (idx >= 0).all() and (idx < 40000).all()
        # disjoint slabs + within-slab FPS uniqueness => globally unique
        assert len(set(idx.tolist())) == 2048
        idx2 = fps_sample_idx_chunked(xyz, 2048)
        np.testing.assert_array_equal(idx, idx2)

    def test_device_resident_matches_host(self, rng, monkeypatch):
        """fps_sample_dev must return exactly fps_sample's rows for BOTH
        dispatch modes (the device-side gather replaces the idx-fetch +
        host-gather + re-upload round trips in the tgn pipeline)."""
        from toothgroupnetwork_tpu.pipelines.base import (
            fps_sample, fps_sample_dev)

        feats = rng.standard_normal((40000, 6)).astype(np.float32)
        for mode in ("exact", "chunked"):
            monkeypatch.setenv("TGN_FPS_SAMPLE", mode)
            want = fps_sample(feats, 2048)
            got = np.asarray(fps_sample_dev(feats, 2048))
            np.testing.assert_array_equal(got, want, err_msg=mode)
        # small-cloud repeat path
        monkeypatch.setenv("TGN_FPS_SAMPLE", "auto")
        small = rng.standard_normal((100, 6)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(fps_sample_dev(small, 256)),
                                      fps_sample(small, 256))

    def test_return_idx_reconstructs_rows(self, rng, monkeypatch):
        """fps_sample_dev(return_idx=True): src[finalize(idx)] must be
        bit-identical to the device-gathered rows for all three dispatch
        modes — the tgn pipeline fetches the ~100 KB index instead of the
        576 KB rows and rebuilds the host copy this way."""
        from toothgroupnetwork_tpu.pipelines.base import fps_sample_dev

        feats = rng.standard_normal((40000, 6)).astype(np.float32)
        for mode in ("exact", "chunked"):
            monkeypatch.setenv("TGN_FPS_SAMPLE", mode)
            dev, idx_dev, finalize = fps_sample_dev(feats, 2048,
                                                    return_idx=True)
            rebuilt = feats[finalize(np.asarray(idx_dev))]
            np.testing.assert_array_equal(rebuilt, np.asarray(dev),
                                          err_msg=mode)
        monkeypatch.setenv("TGN_FPS_SAMPLE", "auto")
        small = rng.standard_normal((100, 6)).astype(np.float32)
        dev, idx_dev, finalize = fps_sample_dev(small, 256, return_idx=True)
        np.testing.assert_array_equal(small[finalize(np.asarray(idx_dev))],
                                      np.asarray(dev))

    def test_coverage_close_to_exact_fps(self, rng):
        """Coverage metric: the max distance from any cloud point to its
        nearest sample (the quantity FPS greedily minimizes). On a scan-like
        SURFACE cloud (the production input: mesh vertices) the chunked
        sampler stays within 1.5x of exact FPS; even on a worst-case 3D
        volume cloud it stays within 2.5x."""
        from scipy.spatial import cKDTree

        from toothgroupnetwork_tpu.pipelines.base import fps_sample_idx_chunked

        def cover_radius(xyz, sample_idx):
            d, _ = cKDTree(xyz[sample_idx]).query(xyz, k=1, workers=-1)
            return d.max()

        n = 512
        # paraboloid sheet ~ jaw-like surface
        u = rng.uniform(-1, 1, 20000)
        v = rng.uniform(-1, 1, 20000)
        surf = np.stack([u, 0.3 * u ** 2 + 0.2 * v ** 2, v], 1).astype(np.float32)
        surf += rng.normal(0, 0.005, surf.shape).astype(np.float32)
        r_a = cover_radius(surf, fps_sample_idx_chunked(surf, n))
        r_e = cover_radius(
            surf, np.asarray(farthest_point_sample(jnp.array(surf), n)))
        assert r_a < 1.5 * r_e, (r_a, r_e)

        vol = rng.standard_normal((20000, 3)).astype(np.float32)
        r_a = cover_radius(vol, fps_sample_idx_chunked(vol, n))
        r_e = cover_radius(
            vol, np.asarray(farthest_point_sample(jnp.array(vol), n)))
        assert r_a < 2.5 * r_e, (r_a, r_e)


class TestKNN:
    def test_exact(self, rng):
        q = rng.standard_normal((33, 3)).astype(np.float32)
        p = rng.standard_normal((77, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(q), jnp.array(p), 5)
        d = np_sqdist(q, p)
        want_idx = np.argsort(d, axis=-1)[:, :5]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                      np.sort(want_idx, -1))
        want_d = np.sqrt(np.take_along_axis(d, want_idx, -1))
        np.testing.assert_allclose(np.asarray(dist), want_d, atol=1e-3)

    def test_sorted_ascending(self, rng):
        q = rng.standard_normal((10, 3)).astype(np.float32)
        p = rng.standard_normal((50, 3)).astype(np.float32)
        _, dist = knn_points(jnp.array(q), jnp.array(p), 7)
        d = np.asarray(dist)
        assert (np.diff(d, axis=-1) >= -1e-6).all()

    def test_k_exceeds_n_reference_pad(self, rng):
        """k > n pads with the cloud's FIRST index at dist2=1e10 — the CUDA
        knnquery unfilled-heap contract (knnquery_cuda_kernel.cu:87-91) that
        trained reference checkpoints see at the deepest crop stage
        (3072 -> 12 points, nsample=24)."""
        q = rng.standard_normal((7, 3)).astype(np.float32)
        p = rng.standard_normal((4, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(q), jnp.array(p), 9)
        idx, dist = np.asarray(idx), np.asarray(dist)
        d = np_sqdist(q, p)
        want_idx = np.argsort(d, axis=-1)
        np.testing.assert_array_equal(idx[:, :4], want_idx)
        np.testing.assert_array_equal(idx[:, 4:], 0)
        np.testing.assert_allclose(dist[:, 4:], np.sqrt(1e10), rtol=1e-6)

    def test_chunking_consistent(self, rng):
        q = rng.standard_normal((100, 3)).astype(np.float32)
        p = rng.standard_normal((64, 3)).astype(np.float32)
        i1, d1 = knn_points(jnp.array(q), jnp.array(p), 4, chunk=16)
        i2, d2 = knn_points(jnp.array(q), jnp.array(p), 4, chunk=100)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_mask_excludes_invalid(self, rng):
        q = rng.standard_normal((8, 3)).astype(np.float32)
        p = rng.standard_normal((20, 3)).astype(np.float32)
        valid = np.ones(20, bool)
        valid[10:] = False
        idx, _ = knn_points(jnp.array(q), jnp.array(p), 3, p_mask=jnp.array(valid))
        assert (np.asarray(idx) < 10).all()

    def test_batched(self, rng):
        q = rng.standard_normal((2, 12, 3)).astype(np.float32)
        p = rng.standard_normal((2, 30, 3)).astype(np.float32)
        idx, _ = knn_points(jnp.array(q), jnp.array(p), 3)
        for b in range(2):
            d = np_sqdist(q[b], p[b])
            want = np.argsort(d, -1)[:, :3]
            np.testing.assert_array_equal(np.sort(np.asarray(idx[b]), -1),
                                          np.sort(want, -1))

    def test_include_self_first(self, rng):
        # Self-query contract (knnquery_cuda_kernel.cu:65-108: the query point
        # itself comes back first): include_self must hold it even when the
        # approximate candidate selection would drop it.
        p = rng.standard_normal((120, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(p), jnp.array(p), 5, include_self=True)
        idx, dist = np.asarray(idx), np.asarray(dist)
        np.testing.assert_array_equal(idx[:, 0], np.arange(120))
        np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-6)
        # result still matches brute force
        want = np.argsort(np_sqdist(p, p), -1)[:, :5]
        np.testing.assert_array_equal(np.sort(idx, -1), np.sort(want, -1))

    def test_include_self_no_duplicate(self, rng):
        # A true duplicate point (distance 0, different index) must not make the
        # self index appear twice in a row.
        p = rng.standard_normal((64, 3)).astype(np.float32)
        p[13] = p[7]  # duplicate pair
        idx, _ = knn_points(jnp.array(p), jnp.array(p), 4, include_self=True)
        idx = np.asarray(idx)
        np.testing.assert_array_equal(idx[:, 0], np.arange(64))
        for row in idx:
            assert len(set(row.tolist())) == len(row)

    def test_include_self_approx_mode(self, rng, monkeypatch):
        # TPU-semantics regression: force the approx_max_k selection path
        # (requires a long candidate axis) and check the self-inclusion
        # invariants plus agreement of the exact re-scored distances.
        monkeypatch.setenv("TGN_TPU_KNN", "approx")
        p = rng.standard_normal((8300, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(p), jnp.array(p), 6, include_self=True)
        idx, dist = np.asarray(idx), np.asarray(dist)
        np.testing.assert_array_equal(idx[:, 0], np.arange(8300))
        np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-6)
        assert (np.diff(dist, axis=-1) >= -1e-6).all()

    def test_bf16_selection_set_recall(self, rng, monkeypatch):
        # TGN_TPU_KNN_SEL=bf16: the selection matrix drops to bf16 for
        # need_dist=False call sites (they consume the candidate SET only).
        # Contract: high set overlap with the exact kNN; include_self
        # invariants preserved.
        monkeypatch.setenv("TGN_TPU_KNN", "approx")
        monkeypatch.setenv("TGN_TPU_KNN_SEL", "bf16")
        n, k = 4096, 16
        p = rng.standard_normal((n, 3)).astype(np.float32)
        idx, _ = knn_points(jnp.array(p), jnp.array(p), k, include_self=True,
                            need_dist=False)
        idx = np.asarray(idx)
        np.testing.assert_array_equal(idx[:, 0], np.arange(n))

        # exact reference in numpy (a second knn_points call with the same
        # shapes would hit the jit cache and ignore the env change)
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        eidx = np.argsort(d2, axis=1)[:, :k]
        overlap = np.mean([len(set(a) & set(b)) / k
                           for a, b in zip(idx, eidx)])
        assert overlap > 0.9, overlap

    def test_include_self_batched(self, rng):
        p = rng.standard_normal((2, 40, 3)).astype(np.float32)
        idx, _ = knn_points(jnp.array(p), jnp.array(p), 3, include_self=True)
        for b in range(2):
            np.testing.assert_array_equal(np.asarray(idx[b])[:, 0], np.arange(40))


class TestBallQuery:
    def test_lowest_index_in_ball(self, rng):
        # Reference semantics: k lowest-INDEX points within radius.
        xyz = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        q = xyz[:6]
        r, k = 0.8, 5
        idx = np.asarray(ball_query(r, k, jnp.array(xyz), jnp.array(q)))
        d = np_sqdist(q, xyz)
        for i in range(6):
            inball = np.nonzero(d[i] <= r * r)[0]
            want = inball[:k]
            if len(want) < k:
                want = np.concatenate([want, np.full(k - len(want), want[0])])
            np.testing.assert_array_equal(idx[i], want)

    def test_empty_ball_falls_back_to_nearest(self):
        xyz = jnp.array([[0.0, 0, 0], [10.0, 0, 0]])
        q = jnp.array([[9.0, 0, 0]])
        idx = np.asarray(ball_query(0.5, 3, xyz, q))
        assert (idx == 1).all()

    def test_masked(self, rng):
        xyz = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
        valid = np.ones(30, bool)
        valid[0] = False
        q = xyz[5:8]
        idx = np.asarray(
            ball_query(2.0, 4, jnp.array(xyz), jnp.array(q), jnp.array(valid)))
        assert (idx != 0).all()


class TestInterpolate:
    def test_weights_match_reference_formula(self, rng):
        src = rng.standard_normal((20, 3)).astype(np.float32)
        feat = rng.standard_normal((20, 6)).astype(np.float32)
        tgt = rng.standard_normal((9, 3)).astype(np.float32)
        got = np.asarray(knn_interpolate(jnp.array(tgt), jnp.array(src),
                                         jnp.array(feat), 3))
        d = np.sqrt(np_sqdist(tgt, src))
        nn = np.argsort(d, -1)[:, :3]
        dd = np.take_along_axis(d, nn, -1)
        recip = 1.0 / (dd + 1e-8)
        w = recip / recip.sum(-1, keepdims=True)
        want = (feat[nn] * w[..., None]).sum(1)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_exact_at_source_points(self, rng):
        src = rng.standard_normal((15, 3)).astype(np.float32)
        feat = rng.standard_normal((15, 4)).astype(np.float32)
        got = np.asarray(knn_interpolate(jnp.array(src), jnp.array(src),
                                         jnp.array(feat), 3))
        # distance 0 -> weight ~1 on self
        np.testing.assert_allclose(got, feat, atol=1e-3)


class TestSampleAndGroup:
    def test_shapes(self, rng):
        xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
        feat = rng.standard_normal((2, 64, 5)).astype(np.float32)
        new_xyz, new_points, fps_idx, idx = sample_and_group(
            16, 0.5, 8, jnp.array(xyz), jnp.array(feat))
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 8)
        assert fps_idx.shape == (2, 16)
        assert idx.shape == (2, 16, 8)

    def test_recentred(self, rng):
        xyz = rng.standard_normal((1, 32, 3)).astype(np.float32)
        new_xyz, new_points, fps_idx, idx = sample_and_group(
            8, 10.0, 4, jnp.array(xyz))
        # with huge radius, first neighbor of each center is lowest index in ball
        # grouped coords are recentered: grouped - center
        g = np.asarray(new_points)
        centers = np.asarray(new_xyz)
        raw = xyz[0][np.asarray(idx)[0]]
        np.testing.assert_allclose(g[0], raw - centers[0][:, None, :], atol=1e-5)


class TestNeedDist:
    """need_dist=False skips the exact re-score but must return the SAME
    neighbor set (and keep the include_self guarantee)."""

    def test_same_set(self, rng):
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        i1, _ = knn_points(jnp.array(pts), jnp.array(pts), 8)
        i2, _ = knn_points(jnp.array(pts), jnp.array(pts), 8, need_dist=False)
        assert (np.sort(np.asarray(i1), -1) == np.sort(np.asarray(i2), -1)).all()

    def test_include_self_first(self, rng):
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(pts), jnp.array(pts), 6,
                               include_self=True, need_dist=False)
        assert (np.asarray(idx)[:, 0] == np.arange(200)).all()
        assert (np.asarray(dist)[:, 0] == 0).all()

    def test_approx_mode_same_contract(self, rng, monkeypatch):
        monkeypatch.setenv("TGN_TPU_KNN", "approx")
        pts = rng.standard_normal((1500, 3)).astype(np.float32)
        idx, _ = knn_points(jnp.array(pts), jnp.array(pts), 8,
                            include_self=True, need_dist=False)
        assert (np.asarray(idx)[:, 0] == np.arange(1500)).all()
        # no duplicate of self among the rest
        rest = np.asarray(idx)[:, 1:]
        assert (rest != np.arange(1500)[:, None]).all()


class TestPallasKNN:
    """ops/pallas/knn_kernel.py — exact selection kernel (interpret mode on
    CPU). Contract-equal to the default jnp exact path."""

    def test_matches_default(self, rng):
        pts = rng.standard_normal((260, 3)).astype(np.float32)
        q = rng.standard_normal((70, 3)).astype(np.float32)
        want, wd = knn_points(jnp.array(q), jnp.array(pts), 5, impl="jnp")
        got, gd = knn_points(jnp.array(q), jnp.array(pts), 5, impl="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), atol=1e-5)

    def test_include_self(self, rng):
        pts = rng.standard_normal((150, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(pts), jnp.array(pts), 4,
                               impl="pallas", include_self=True)
        assert (np.asarray(idx)[:, 0] == np.arange(150)).all()
        assert (np.asarray(dist)[:, 0] == 0).all()

    def test_masked(self, rng):
        pts = rng.standard_normal((140, 3)).astype(np.float32)
        valid = np.arange(140) < 100
        q = rng.standard_normal((30, 3)).astype(np.float32)
        idx, _ = knn_points(jnp.array(q), jnp.array(pts), 6, impl="pallas",
                            p_mask=jnp.array(valid))
        assert (np.asarray(idx) < 100).all()

    def test_k_exceeds_n(self, rng):
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        q = rng.standard_normal((6, 3)).astype(np.float32)
        idx, dist = knn_points(jnp.array(q), jnp.array(pts), 16, impl="pallas")
        assert idx.shape == (6, 16)
        assert (np.diff(np.asarray(dist), axis=-1) >= -1e-6).all()


class TestCellCandidates:
    """ops/cells.py: super-row candidate machinery for the gather redesign."""

    def _sorted_cloud(self, rng, n=4096):
        from toothgroupnetwork_tpu.ops.cells import spatial_sort_perm

        u1 = rng.uniform(-1, 1, n)
        u2 = rng.uniform(-1, 1, n)
        xyz = np.stack([u1, 0.3 * u1 ** 2 + 0.2 * u2 ** 2, u2], 1)
        xyz = (xyz + rng.normal(0, 0.01, xyz.shape)).astype(np.float32)
        return xyz[spatial_sort_perm(xyz, slab=512)]

    def test_positions_reconstruct_indices(self, rng):
        from toothgroupnetwork_tpu.ops.cells import build_cell_candidates

        xs = self._sorted_cloud(rng)
        idx, _ = knn_points(jnp.asarray(xs), jnp.asarray(xs), 16,
                            include_self=True, need_dist=False)
        idx = np.asarray(idx)
        L = 24
        cand, pos, ncells = map(np.asarray,
                                build_cell_candidates(jnp.asarray(idx), L))
        assert (pos < L * 8).all(), "no overflow expected at L=24, k=16"
        g_of = np.arange(len(xs)) // 8
        rec = cand[g_of[:, None], pos // 8] * 8 + pos % 8
        np.testing.assert_array_equal(rec, idx)
        # candidate rows ascending (required by the position lookup)
        assert (np.diff(cand, axis=1) >= 0).all()

    def test_overflow_goes_to_dump(self, rng):
        from toothgroupnetwork_tpu.ops.cells import build_cell_candidates

        # random (unsorted) cloud with tiny L forces overflow
        idx = rng.integers(0, 4096, (4096, 16)).astype(np.int32)
        L = 4
        cand, pos, ncells = map(np.asarray,
                                build_cell_candidates(jnp.asarray(idx), L))
        assert (pos == L * 8).any()
        valid = pos < L * 8
        g_of = np.arange(4096) // 8
        rec = cand[g_of[:, None], np.minimum(pos // 8, L - 1)] * 8 + pos % 8
        np.testing.assert_array_equal(rec[valid], idx[valid])

    def test_gather_candidate_blocks(self, rng):
        from toothgroupnetwork_tpu.ops.cells import (
            build_cell_candidates, gather_candidate_blocks)

        xs = self._sorted_cloud(rng)
        idx, _ = knn_points(jnp.asarray(xs), jnp.asarray(xs), 16,
                            include_self=True, need_dist=False)
        cand, pos, _ = build_cell_candidates(jnp.asarray(np.asarray(idx)), 24)
        x = rng.standard_normal((len(xs), 8)).astype(np.float32)
        blk = np.asarray(gather_candidate_blocks(jnp.asarray(x), cand))
        cand = np.asarray(cand)
        assert blk.shape == (len(xs) // 8, 24 * 8, 8)
        for gg, ll in [(0, 0), (7, 3), (100, 20)]:
            np.testing.assert_allclose(
                blk[gg, ll * 8:(ll + 1) * 8],
                x[cand[gg, ll] * 8:(cand[gg, ll] + 1) * 8])


class TestCellSelectKernel:
    """ops/pallas/cell_select_kernel.py (interpret mode off-TPU): the one-hot
    matmul select must reproduce index_points gathers bit-exactly."""

    def test_matches_gather(self, rng):
        from toothgroupnetwork_tpu.ops.cells import (
            build_cell_candidates, gather_candidate_blocks, spatial_sort_perm,
            pos_with_self_fallback)
        from toothgroupnetwork_tpu.ops.pallas.cell_select_kernel import (
            cell_select_p, cell_select_x)

        n, k, c, L = 512, 12, 16, 24
        u1 = rng.uniform(-1, 1, n)
        u2 = rng.uniform(-1, 1, n)
        xyz = np.stack([u1, 0.3 * u1 ** 2 + 0.2 * u2 ** 2, u2], 1)
        xyz = (xyz + rng.normal(0, 0.01, xyz.shape)).astype(np.float32)
        xyz = xyz[spatial_sort_perm(xyz, slab=128)]
        x = rng.standard_normal((n, c)).astype(np.float32)

        idx, _ = knn_points(jnp.asarray(xyz), jnp.asarray(xyz), k,
                            include_self=True, need_dist=False)
        cand, pos, _ = build_cell_candidates(idx, L)
        pos = pos_with_self_fallback(pos, L * 8)
        blk_x = gather_candidate_blocks(jnp.asarray(x), cand)
        blk_p = gather_candidate_blocks(jnp.asarray(xyz), cand)
        xg = cell_select_x(blk_x, pos)
        pr = cell_select_p(blk_p, pos, jnp.asarray(xyz))

        want_xg = np.asarray(index_points(jnp.asarray(x), idx))
        want_pr = (np.asarray(index_points(jnp.asarray(xyz), idx))
                   - xyz[:, None, :])
        np.testing.assert_array_equal(np.asarray(xg), want_xg)
        np.testing.assert_allclose(np.asarray(pr), want_pr, atol=1e-7)

    def test_bf16_features(self, rng):
        from toothgroupnetwork_tpu.ops.cells import (
            build_cell_candidates, gather_candidate_blocks, spatial_sort_perm,
            pos_with_self_fallback)
        from toothgroupnetwork_tpu.ops.pallas.cell_select_kernel import (
            cell_select_x)

        n, k, c, L = 256, 8, 32, 16
        xyz = rng.standard_normal((n, 3)).astype(np.float32)
        xyz = xyz[spatial_sort_perm(xyz, slab=64)]
        x = rng.standard_normal((n, c)).astype(np.float32)
        idx, _ = knn_points(jnp.asarray(xyz), jnp.asarray(xyz), k,
                            include_self=True, need_dist=False)
        cand, pos, _ = build_cell_candidates(idx, L)
        pos = pos_with_self_fallback(pos, L * 8)
        blk_x = gather_candidate_blocks(
            jnp.asarray(x).astype(jnp.bfloat16), cand)
        xg = cell_select_x(blk_x, pos)
        assert xg.dtype == jnp.bfloat16
        want = np.asarray(index_points(
            jnp.asarray(x).astype(jnp.bfloat16), idx))
        np.testing.assert_array_equal(
            np.asarray(xg.astype(jnp.float32)),
            want.astype(np.float32))


class TestOnehotGatherKernel:
    """ops/pallas/gather_kernel.py (interpret mode off-TPU): the two-level
    one-hot MXU gather must be bit-equal to index_points for bf16 sources.
    Off-path machinery (TGN_TPU_GATHER=mxu opt-in; the r5 A/B measured it
    0.56x vs XLA at its most favorable shape) — contract kept pinned so the
    opt-in stays trustworthy."""

    def test_bit_exact_bf16(self, rng):
        from toothgroupnetwork_tpu.ops.pallas.gather_kernel import (
            onehot_gather, onehot_gather_packed)

        b, n, c, m, k = 2, 200, 32, 57, 9   # n not a multiple of 128
        x = jnp.asarray(rng.standard_normal((b, n, c)),
                        dtype=jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, (b, m, k)), dtype=jnp.int32)
        got = onehot_gather(x, idx)
        want = index_points(x, idx)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32),
            np.asarray(want, dtype=np.float32))
        packed = onehot_gather_packed(x, idx)
        np.testing.assert_array_equal(
            np.asarray(packed, dtype=np.float32),
            np.asarray(want, dtype=np.float32).reshape(b, m, k * c))

    def test_dispatcher_optin(self, rng, monkeypatch):
        from toothgroupnetwork_tpu.ops.gather import gather_neighbors

        x = jnp.asarray(rng.standard_normal((1, 160, 16)),
                        dtype=jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, 160, (1, 40, 5)), dtype=jnp.int32)
        want = np.asarray(index_points(x, idx), dtype=np.float32)
        monkeypatch.setenv("TGN_TPU_GATHER", "mxu")
        got = gather_neighbors(x, idx, train=False)
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32), want)
        monkeypatch.setenv("TGN_TPU_GATHER", "auto")
        got2 = gather_neighbors(x, idx, train=False)
        np.testing.assert_array_equal(
            np.asarray(got2, dtype=np.float32), want)


class TestWindowedSelfKNN:
    """ops/knn.py:knn_self_windowed — the r4 inference stage-kNN (axis
    windows over equal-count slabs). Contracts: self-first with distance 0,
    and near-perfect neighbor-set recall on SURFACE clouds (the only
    production input — scans and surface-disk crops; volume balls can lose
    window recall and are deliberately not claimed)."""

    def test_self_first_and_surface_recall(self, rng, tmp_path):
        from scipy.spatial import cKDTree
        from synthetic import write_synthetic_obj

        from toothgroupnetwork_tpu.data.mesh_io import parse_obj
        from toothgroupnetwork_tpu.data.scan_prep import \
            normalize_scan_vertices
        from toothgroupnetwork_tpu.ops.knn import knn_self_windowed

        p = str(tmp_path / "s_lower.obj")
        write_synthetic_obj(p, n_side=120, seed=0)
        v, _ = parse_obj(p)
        v = normalize_scan_vertices(v).astype(np.float32)[:14400]
        k = 36
        idx, dist = knn_self_windowed(jnp.asarray(v[None]), k)
        idx = np.asarray(idx)[0]
        np.testing.assert_array_equal(idx[:, 0], np.arange(len(v)))
        assert (np.asarray(dist)[0][:, 0] == 0).all()
        _, nn = cKDTree(v).query(v, k=k, workers=-1)
        rows = np.arange(0, len(v), 37)
        ov = np.array([len(np.intersect1d(idx[i], nn[i])) for i in rows]) / k
        assert ov.mean() > 0.995

    def test_batched_surface_crops(self, rng, tmp_path):
        """make_crops-like surface-disk crops (the stage-2 shape class):
        windowed recall must be ~exact — measured 1.0 on all crops."""
        from scipy.spatial import cKDTree
        from synthetic import write_synthetic_obj

        from toothgroupnetwork_tpu.data.mesh_io import parse_obj
        from toothgroupnetwork_tpu.data.scan_prep import \
            normalize_scan_vertices
        from toothgroupnetwork_tpu.ops.knn import knn_self_windowed

        p = str(tmp_path / "s_lower.obj")
        write_synthetic_obj(p, n_side=170, seed=1)
        v, _ = parse_obj(p)
        v = normalize_scan_vertices(v).astype(np.float32)
        tree = cKDTree(v)
        cents = v[rng.integers(0, len(v), 4)]
        _, ci = tree.query(cents, k=3072, workers=-1)
        crops = np.stack([v[ci[j]] - v[ci[j]].mean(0) for j in range(4)])
        idx, _ = knn_self_windowed(jnp.asarray(crops), 24)
        idx = np.asarray(idx)
        np.testing.assert_array_equal(idx[:, :, 0],
                                      np.broadcast_to(np.arange(3072),
                                                      (4, 3072)))
        for j in range(4):
            _, nn = cKDTree(crops[j]).query(crops[j], k=24, workers=-1)
            rows = np.arange(0, 3072, 53)
            ov = np.array([len(np.intersect1d(idx[j, i], nn[i]))
                           for i in rows]) / 24
            assert ov.mean() > 0.995


class TestTwoLevelKNN:
    """ops/knn.py:knn_two_level — anchor-bucketed kNN (built for the purity
    query; measured GATHER-bound and off-path there — see the op docstring —
    but kept as a contract-tested op for moderate-M call sites). Asserts
    recall vs the exact kNN on an FPS-ordered clustered cloud, and exact-d2
    semantics."""

    def _fps_ordered_cloud(self, rng, n=4096):
        # clustered "teeth + gingiva" cloud, then FPS-order it so the anchor
        # prefix contract matches the pipeline's sampled clouds
        import jax

        from toothgroupnetwork_tpu.ops import farthest_point_sample

        centers = rng.uniform(-0.7, 0.7, (14, 3)).astype(np.float32)
        pts = np.concatenate(
            [c + rng.normal(0, 0.05, (n // 16, 3)) for c in centers]
            + [rng.uniform(-0.8, 0.8, (n - 14 * (n // 16), 3))], 0
        ).astype(np.float32)
        order = np.asarray(farthest_point_sample(jnp.asarray(pts), n))
        return pts[order]

    def test_recall_and_exact_d2(self, rng):
        """Pipeline-proportional config: the purity RATIO call site runs
        A=2048, C=512, P=1 against N=24000 (one anchor cell ~12 points,
        candidates cover ~43 cells around the query; k>1 must use P=1 — see
        the duplicate note in knn_two_level). Mirrored here at N=6000, A=512,
        C=512 (11.7 points/cell, same coverage)."""
        from toothgroupnetwork_tpu.ops.knn import knn_two_level

        n = 6000
        pts = self._fps_ordered_cloud(rng, n)
        q = (pts[rng.permutation(n)[:2000]]
             + rng.normal(0, 0.01, (2000, 3)).astype(np.float32))
        k = 40
        idx, d2 = knn_two_level(jnp.asarray(q), jnp.asarray(pts), k,
                                n_anchors=512, n_cand=512, n_probe=1)
        # exact reference
        full = ((q[:, None] - pts[None]) ** 2).sum(-1)
        exact = np.argsort(full, axis=1, kind="stable")[:, :k]
        recall = np.mean([
            len(set(np.asarray(idx)[i]) & set(exact[i])) / k
            for i in range(len(q))])
        assert recall > 0.999, recall
        # d2 within the candidate set is exact f32 subtraction
        np.testing.assert_allclose(
            np.asarray(d2),
            np.take_along_axis(full, np.asarray(idx), axis=1),
            rtol=1e-5, atol=1e-7)
        # ascending order
        assert np.all(np.diff(np.asarray(d2), axis=1) >= -1e-7)

    def test_nn1_exact_match_pipeline_scale(self, rng):
        """The purity 1-NN label becomes boundary points' OUTPUT semantics
        (postprocess/boundary.py) — validate nn1 agreement against the exact
        KD-tree at the REAL call-site scale and config (52k full-res queries
        x 24000 FPS-ordered reference, A=2048 C=512 P=2)."""
        from scipy.spatial import cKDTree

        from toothgroupnetwork_tpu.ops.knn import knn_two_level

        pts = self._fps_ordered_cloud(rng, 24000)
        # queries: surface-like (near reference points), the org-vertex case
        base = pts[rng.integers(0, 24000, 52000)]
        q = (base + rng.normal(0, 0.008, base.shape)).astype(np.float32)
        idx, d2 = knn_two_level(jnp.asarray(q), jnp.asarray(pts), 1,
                                n_anchors=2048, n_cand=512, n_probe=2)
        tree = cKDTree(pts)
        td, tnn = tree.query(q, k=1)
        got = np.asarray(idx)[:, 0]
        # identical point (or an exact distance tie)
        same = (got == tnn) | np.isclose(np.asarray(d2)[:, 0], td ** 2,
                                         rtol=1e-5, atol=1e-7)
        assert same.mean() == 1.0, same.mean()

    def test_p_mask(self, rng):
        from toothgroupnetwork_tpu.ops.knn import knn_two_level

        pts = rng.standard_normal((512, 3)).astype(np.float32)
        q = pts[:64] + 1e-4
        valid = np.ones(512, bool)
        valid[::2] = False
        idx, _ = knn_two_level(jnp.asarray(q), jnp.asarray(pts), 8,
                               jnp.asarray(valid), n_anchors=128, n_cand=64)
        assert np.all(np.asarray(idx) % 2 == 1)


class TestF16Upload:
    def test_fused_f16_upload_matches_quantized_host(self, rng, monkeypatch):
        """TGN_TPU_UPLOAD=f16 (the TPU default) ships the fused-FPS padded
        buffer as float16; the device-side selection must equal the host
        chunked algorithm run on the same f16-quantized cloud, and the
        gathered rows must be the quantized rows (all consumers cast back to
        f32 in-program)."""
        from toothgroupnetwork_tpu.pipelines.base import (
            fps_sample_idx_chunked, fps_sample_dev)

        feats = rng.standard_normal((40000, 6)).astype(np.float32)
        q = feats.astype(np.float16).astype(np.float32)
        monkeypatch.setenv("TGN_FPS_SAMPLE", "chunked")
        monkeypatch.setenv("TGN_TPU_UPLOAD", "f16")
        ctx = {}
        dev, idx_dev, finalize = fps_sample_dev(feats, 2048, return_idx=True,
                                                ctx=ctx)
        gidx = finalize(np.asarray(idx_dev))
        want_idx = fps_sample_idx_chunked(q[:, :3], 2048)
        np.testing.assert_array_equal(gidx, want_idx)
        np.testing.assert_array_equal(np.asarray(dev), q[gidx])
        assert np.asarray(ctx["feats_pad_dev"]).dtype == np.float16
