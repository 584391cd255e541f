"""tgn two-stage inference pipeline tests (tiny arch, small sample size) +
postprocess unit tests (clustering, boundary resampling, fusion)."""

import os

import numpy as np
import jax
import pytest

from toothgroupnetwork_tpu.postprocess.clustering import (
    clustering_points, first_label_ratio, get_clustering_labels)
from toothgroupnetwork_tpu.postprocess.boundary import boundary_sampled_feats
from toothgroupnetwork_tpu.postprocess.fusion import (
    disambiguate_arch_labels, merge_boundary_clusters)

from synthetic import make_synthetic_jaw_points, write_synthetic_obj


class TestClustering:
    def test_dbscan_separates_blobs(self, rng):
        # 3 dense, well-separated blobs
        blobs = [rng.normal(c, 0.005, (200, 3)) for c in
                 ([0, 0, 0], [0.5, 0, 0], [0, 0.5, 0])]
        pts = np.concatenate(blobs).astype(np.float64)
        labels = np.ones(len(pts))  # all FG
        out = get_clustering_labels(pts, labels)
        assert len(out) == len(pts)
        assert len(np.unique(out)) == 3
        # each blob is one pure cluster
        for i in range(3):
            seg = out[i * 200:(i + 1) * 200]
            assert len(np.unique(seg)) == 1

    def test_noise_absorbed(self, rng):
        blob = rng.normal(0, 0.005, (100, 3))
        outlier = np.array([[5.0, 5, 5]])
        pts = np.concatenate([blob, outlier])
        out = get_clustering_labels(pts, np.ones(len(pts)))
        # outlier absorbed into the blob's cluster by 10-NN vote
        assert out[-1] == out[0]

    def test_kmeans_dispatch(self, rng):
        pts = np.concatenate([rng.normal(0, 0.01, (50, 3)),
                              rng.normal(1, 0.01, (50, 3))])
        cents, cent_labels, labels = clustering_points([pts], "kmeans", [2])
        assert len(cents[0]) == 2
        assert len(np.unique(labels[0])) == 2

    def test_first_label_ratio(self):
        arr = np.array([[1, 1, 2, 1], [3, 4, 4, 4]])
        np.testing.assert_allclose(first_label_ratio(arr), [0.75, 0.25])

    def test_aggl_dispatch(self, rng):
        pts = np.concatenate([rng.normal(0, 0.01, (40, 3)),
                              rng.normal(1, 0.01, (40, 3))])
        cents, _, labels = clustering_points([pts], "aggl", [2])
        assert len(cents[0]) == 2
        assert len(np.unique(labels[0])) == 2

    def test_unknown_method_falls_through_to_gmm(self, rng):
        """ops_utils.py:35: any unrecognized method -> GaussianMixture."""
        pts = np.concatenate([rng.normal(0, 0.01, (40, 3)),
                              rng.normal(1, 0.01, (40, 3))])
        cents, _, labels = clustering_points([pts], "anything_else", [2])
        assert len(cents[0]) == 2
        assert len(np.unique(labels[0])) == 2


class TestBoundaryResample:
    def test_boundary_detection_and_sizes(self, rng):
        # two half-planes with different labels -> boundary at x ~ 0
        n = 3000
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        labels = (pts[:, 0] > 0).astype(np.int64) + 1
        feats = np.concatenate([pts, np.zeros_like(pts)], -1)
        org = feats.copy()
        out_feats, out_labels, n_bd = boundary_sampled_feats(
            labels, org, feats, bdl_ratio=0.7, num_bdl_points=500,
            num_all_points=1000)
        assert out_feats.shape == (1000, 6)
        assert out_labels.shape[0] == 1000
        assert 0 < n_bd <= 500
        # boundary points concentrate near x = 0
        assert np.abs(out_feats[:n_bd, 0]).mean() < np.abs(feats[:, 0]).mean()

    def test_device_purity_matches_kdtree(self, rng):
        """_purity_device_fn (the TPU path, gated off on CPU-size inputs)
        must agree with the host KD-tree path: identical nn1 labels, ratio
        within the two-level candidate-recall tolerance. Exercised directly
        since the pipeline's CPU runs never enter it."""
        import jax.numpy as jnp
        from scipy.spatial import cKDTree

        from toothgroupnetwork_tpu.ops import farthest_point_sample
        from toothgroupnetwork_tpu.postprocess.boundary import \
            _purity_device_fn
        from toothgroupnetwork_tpu.postprocess.clustering import \
            first_label_ratio

        centers = rng.uniform(-0.6, 0.6, (14, 3)).astype(np.float32)
        org = np.concatenate(
            [c + rng.normal(0, 0.05, (1500, 3)) for c in centers],
            0).astype(np.float32)
        order = np.asarray(farthest_point_sample(jnp.asarray(org), 4000))
        sampled = org[order]                      # FPS-ordered, as in-pipeline
        labels = rng.integers(0, 17, 4000).astype(np.int32)

        k, bdl_ratio = 40, 0.7
        bd_d, nn1_d, nn1_i, nn1_d2, spec_fps = _purity_device_fn(
            jnp.asarray(org), jnp.asarray(sampled),
            jnp.asarray(labels.astype(np.uint8)), k, bdl_ratio)
        tree = cKDTree(sampled)
        dist, nn = tree.query(org, k=k, workers=-1)
        ratio_h = first_label_ratio(labels[nn])
        nn1_h = labels[nn[:, 0]]

        np.testing.assert_array_equal(np.asarray(nn1_d), nn1_h)
        # the exact 1-NN byproduct the pipeline's final transfer reuses
        np.testing.assert_array_equal(np.asarray(nn1_i), nn[:, 0])
        np.testing.assert_allclose(np.asarray(nn1_d2), dist[:, 0] ** 2,
                                   rtol=1e-4, atol=1e-9)
        # in-program threshold: mismatches only where ratio straddles the
        # boundary within the approx candidate-recall tolerance (1/40 per
        # missed candidate)
        near = np.abs(ratio_h - bdl_ratio) <= 2.5 / k
        agree = np.asarray(bd_d) == (ratio_h < bdl_ratio)
        assert agree[~near].all()
        assert agree.mean() > 0.99
        # the speculative non-boundary FPS fused into the program must be a
        # prefix-consistent exact FPS of the program's OWN non-boundary set.
        # Random labels make nearly everything boundary above, so run a
        # second purity call with a half-space label field (real boundary
        # plane at x=0, plenty of non-boundary mass on both sides).
        labels_hs = (sampled[:, 0] > 0).astype(np.uint8) + 1
        bd_hs, _, _, _, spec_hs = _purity_device_fn(
            jnp.asarray(org), jnp.asarray(sampled),
            jnp.asarray(labels_hs), k, bdl_ratio)
        bd_np = np.asarray(bd_hs)
        m = min(512, int(np.count_nonzero(~bd_np)))
        assert m > 100  # the half-space field must leave non-boundary mass
        loc = np.asarray(farthest_point_sample(jnp.asarray(org[~bd_np]), m))
        np.testing.assert_array_equal(np.asarray(spec_hs)[:m],
                                      np.where(~bd_np)[0][loc])

    @pytest.mark.parametrize("win_frac", [3, 5])
    def test_window_purity_matches_kdtree(self, rng, tmp_path, win_frac):
        """_purity_window_fn (the r4 TPU default at production sizes) must
        agree with the host KD-tree on a synthetic SURFACE scan with the
        windows proper subsets of the sampled cloud: exact nn1 index/label/d2
        (window-true 1-NN), boundary mask agreement, and a fill-FPS index
        plane of unique valid non-boundary rows. Parametrized over the
        TGN_TPU_WIN_FRAC settings (5 = default ±2-slab margin; 3 = the
        narrow ±1-slab margin)."""
        import jax.numpy as jnp
        from scipy.spatial import cKDTree
        from synthetic import write_synthetic_obj

        from toothgroupnetwork_tpu.data.mesh_io import parse_obj
        from toothgroupnetwork_tpu.data.scan_prep import \
            normalize_scan_vertices
        from toothgroupnetwork_tpu.ops import farthest_point_sample
        from toothgroupnetwork_tpu.postprocess.boundary import (
            _SPEC_FPS, _purity_window_fn)
        from toothgroupnetwork_tpu.postprocess.clustering import \
            first_label_ratio

        p = str(tmp_path / "s_lower.obj")
        write_synthetic_obj(p, n_side=100, seed=0)    # ~10k surface verts
        v, _ = parse_obj(p)
        v = normalize_scan_vertices(v).astype(np.float32)
        n0 = v.shape[0]
        n_pad = -(-n0 // 8192) * 8192
        pad = np.zeros((n_pad, 3), np.float32)
        pad[:n0] = v
        order = np.asarray(farthest_point_sample(jnp.asarray(v), 4800))
        sampled = v[order]                 # windows = 1500-row subsets
        labels = (sampled[:, 0] > 0).astype(np.uint8) + 1

        k, r = 40, 0.7
        bd, nn1lab, nn1, nn1d2, fps = _purity_window_fn(
            jnp.asarray(pad), jnp.asarray(sampled), jnp.asarray(labels),
            k, r, n_valid=n0, win_frac=win_frac)
        dist, nn = cKDTree(sampled).query(v, k=k, workers=-1)
        ratio_h = first_label_ratio(labels[nn])

        # index equality up to exact-distance ties (cKDTree breaks ties by
        # index; the top-4 re-score by candidate order) — every pick must
        # reproduce the true 1-NN DISTANCE exactly
        nn1_np = np.asarray(nn1)[:n0]
        mism = nn1_np != nn[:, 0]
        assert mism.mean() < 1e-3
        np.testing.assert_allclose(np.asarray(nn1d2)[:n0], dist[:, 0] ** 2,
                                   rtol=1e-4, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(nn1lab)[:n0][~mism],
                                      labels[nn[:, 0]][~mism])
        near = np.abs(ratio_h - r) <= 2.5 / k
        agree = np.asarray(bd)[:n0] == (ratio_h < r)
        assert agree[~near].all()
        # chunked fill-FPS: unique valid non-boundary picks
        fps_np = np.asarray(fps)
        assert fps_np.shape == (_SPEC_FPS,)
        assert (fps_np < n0).all()
        assert len(np.unique(fps_np)) == _SPEC_FPS
        assert not (ratio_h < r)[fps_np].any()

    def test_masked_fps_matches_compacted_subset(self, rng):
        """_masked_fps (device FPS over the non-boundary subset, masked
        directly on the padded org cloud) must select EXACTLY the points the
        host route selects by compacting the subset and running exact FPS:
        same seed (first valid point) and the same per-iteration argmax."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.ops import farthest_point_sample
        from toothgroupnetwork_tpu.postprocess.boundary import _masked_fps

        n0, n_pad, need = 3000, 4096, 512
        org = rng.uniform(-1, 1, (n0, 3)).astype(np.float32)
        bd = rng.random(n0) < 0.35
        pad = np.zeros((n_pad, 3), np.float32)
        pad[:n0] = org
        bd_pad = np.zeros(n_pad, bool)
        bd_pad[:n0] = bd
        # also flag some PAD rows boundary: the row<n_valid guard must win
        bd_pad[n0 + 10:n0 + 20] = True

        g_idx = np.asarray(_masked_fps(jnp.asarray(pad), jnp.asarray(bd_pad),
                                       n0, need))
        non_bd = org[~bd]
        local = np.asarray(farthest_point_sample(jnp.asarray(non_bd), need))
        expected = np.where(~bd)[0][local]
        np.testing.assert_array_equal(g_idx, expected)

    def test_boundary_resample_device_route_matches_host(self, rng):
        """boundary_sampled_feats with a primed device_ctx (bd_mask_dev /
        org_pad_dev, as the TPU purity path stashes them) must produce the
        same cloud as the host route when both use exact FPS — the masked
        selection and the compact-then-FPS selection are the same points."""
        import jax.numpy as jnp

        n = 3000
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        labels = (pts[:, 0] > 0).astype(np.int64) + 1
        feats = np.concatenate([pts, np.zeros_like(pts)], -1)
        host_out, host_lab, host_nbd = boundary_sampled_feats(
            labels, feats, feats, bdl_ratio=0.7, num_bdl_points=500,
            num_all_points=1000)

        # prime a device_ctx the way _boundary_purity's TPU path does
        from toothgroupnetwork_tpu.postprocess.boundary import \
            _boundary_purity

        bd_mask, ps, _, _ = _boundary_purity(
            pts, feats[:, :3], labels, min(40, n), 0.7)
        n_pad = 4096
        pad = np.zeros((n_pad, 3), np.float32)
        pad[:n] = pts
        bd_pad = np.zeros(n_pad, bool)
        bd_pad[:n] = bd_mask
        ctx = {"org_pad_dev": jnp.asarray(pad),
               "bd_mask_dev": jnp.asarray(bd_pad), "n_org": n}
        dev_out, dev_lab, dev_nbd = boundary_sampled_feats(
            labels, feats, feats, bdl_ratio=0.7, num_bdl_points=500,
            num_all_points=1000, device_ctx=ctx)
        assert dev_nbd == host_nbd
        np.testing.assert_array_equal(dev_out, host_out)
        np.testing.assert_array_equal(dev_lab, host_lab)

        # speculative route: a prefetched nonbd_fps_idx plane (as the TPU
        # purity program returns) short-circuits the separate dispatch and
        # must land on the same cloud
        from toothgroupnetwork_tpu.postprocess.boundary import _masked_fps
        spec = np.asarray(_masked_fps(ctx["org_pad_dev"],
                                      ctx["bd_mask_dev"], n, 1024))
        ctx2 = dict(ctx, nonbd_fps_idx=spec)
        spec_out, spec_lab, spec_nbd = boundary_sampled_feats(
            labels, feats, feats, bdl_ratio=0.7, num_bdl_points=500,
            num_all_points=1000, device_ctx=ctx2)
        assert spec_nbd == host_nbd
        np.testing.assert_array_equal(spec_out, host_out)
        np.testing.assert_array_equal(spec_lab, host_lab)

    def test_device_purity_accepts_feats_buffer(self, rng):
        """The pipeline passes its device-resident [M,6] FEATURE buffer as the
        sampled cloud (skipping a 288 KB re-upload); the kernel must slice
        xyz itself."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.postprocess.boundary import \
            _purity_device_fn

        org = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
        sampled = rng.uniform(-1, 1, (500, 6)).astype(np.float32)
        labels = rng.integers(0, 17, 500).astype(np.uint8)
        bd6, l6, i6, d6, f6 = _purity_device_fn(
            jnp.asarray(org), jnp.asarray(sampled), jnp.asarray(labels),
            20, 0.7)
        bd3, l3, i3, d3, f3 = _purity_device_fn(
            jnp.asarray(org), jnp.asarray(sampled[:, :3]),
            jnp.asarray(labels), 20, 0.7)
        np.testing.assert_array_equal(np.asarray(i6), np.asarray(i3))
        np.testing.assert_array_equal(np.asarray(bd6), np.asarray(bd3))
        # org side: the purity query reuses the fused-FPS [Np,6] upload
        org6 = np.concatenate([org, np.zeros_like(org)], -1)
        bdo, lo, io, do, fo = _purity_device_fn(
            jnp.asarray(org6), jnp.asarray(sampled), jnp.asarray(labels),
            20, 0.7)
        np.testing.assert_array_equal(np.asarray(io), np.asarray(i3))
        np.testing.assert_array_equal(np.asarray(bdo), np.asarray(bd3))

    def test_device_final_transfer_matches_host(self, rng):
        """_final_transfer_fns (device combine of the purity nn1 with the
        boundary-half 1-NN + uint8 label gather) must reproduce the host
        route's ``concat([ins, mod_ps])[nn]`` semantics, including the
        ties-go-to-sampled rule."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.pipelines.tgn import _final_transfer_fns

        n_q, n_s, n_b = 4096, 512, 128
        nn1 = rng.integers(0, n_s, n_q).astype(np.int32)
        nn_b = rng.integers(0, n_b, n_q).astype(np.int32)
        nn1_d2 = rng.uniform(0, 1, n_q).astype(np.float32)
        # mix of closer / farther / exactly tied boundary distances
        d_b2 = np.where(rng.uniform(size=n_q) < 0.3, nn1_d2,
                        rng.uniform(0, 1, n_q)).astype(np.float32)
        ins = rng.integers(0, 20, n_s + n_b).astype(np.uint8)
        sem = rng.integers(0, 17, n_s + n_b).astype(np.uint8)

        full_fn, nob_fn = _final_transfer_fns()
        di, ds = jax.device_get(full_fn(
            jnp.asarray(nn1), jnp.asarray(nn1_d2), jnp.asarray(nn_b),
            jnp.asarray(d_b2), jnp.asarray(ins), jnp.asarray(sem),
            jnp.int32(n_s)))

        nn = np.where(d_b2 < nn1_d2, n_s + nn_b, nn1)  # ties -> sampled
        np.testing.assert_array_equal(di, ins[nn])
        np.testing.assert_array_equal(ds, sem[nn])

        di0, ds0 = jax.device_get(nob_fn(
            jnp.asarray(nn1), jnp.asarray(ins), jnp.asarray(sem)))
        np.testing.assert_array_equal(di0, ins[nn1])
        np.testing.assert_array_equal(ds0, sem[nn1])


class TestFusion:
    def _arch(self, rng):
        pts, _, cls = make_synthetic_jaw_points(2000, 8, seed=0)
        gt = cls.copy()  # 0 gingiva, 1..16
        # inference half-label convention (1-based argmax space): full 1..8 -> same,
        # 9 (left central incisor) keeps its own class 9, 10..16 -> 2..8.
        half = np.where(gt >= 10, gt - 8, gt)
        ins = gt.copy()  # instance per tooth
        return pts.astype(np.float64), ins, half

    def test_arch_disambiguation_recovers_sides(self, rng):
        pts, ins, half = self._arch(rng)
        new_sem = disambiguate_arch_labels(pts, ins.copy(), half)
        # majority of points should get their original full-arch label back,
        # modulo a possible global left/right flip of the checking axis
        gt = ins
        direct = (new_sem[gt > 0] == gt[gt > 0]).mean()
        # global side-flip alternative (centrals 1/9 never flip)
        flipped_gt = np.where(gt >= 10, gt - 8,
                              np.where((gt >= 2) & (gt <= 8), gt + 8, gt))
        flipped = (new_sem[gt > 0] == flipped_gt[gt > 0]).mean()
        assert max(direct, flipped) > 0.95

    def test_merge_boundary_clusters(self, rng):
        pts, ins, half = self._arch(rng)
        new_sem = np.where(ins > 0, ins, 0)
        # boundary cloud = jittered copies of tooth points with own cluster ids
        sel = ins > 0
        bdl_xyz = pts[sel] + rng.normal(0, 1e-4, (sel.sum(), 3))
        bdl_ps = ins[sel].copy()  # pretend kmeans ids == tooth ids
        mod_ps, mod_sem = merge_boundary_clusters(pts, ins, new_sem,
                                                  bdl_xyz, bdl_ps)
        np.testing.assert_array_equal(mod_ps, ins[sel])
        np.testing.assert_array_equal(mod_sem, new_sem[sel])


@pytest.mark.slow
class TestTgnPipelineEndToEnd:
    def test_pipeline_runs(self, tmp_path, rng):
        from toothgroupnetwork_tpu.models import get_task
        from toothgroupnetwork_tpu.pipelines.tgn import TgnInferencePipeline
        from toothgroupnetwork_tpu.train.checkpoints import save_weights
        from toothgroupnetwork_tpu.models.tgnet import TGNet
        import jax.numpy as jnp

        n_sample, crop = 512, 64
        task = get_task("tgnet_fps")
        cfg = task.default_config()
        cfg.model_parameter.update({
            "planes": [8, 16], "stride": [1, 4], "nsample": [8, 8],
            "blocks": [2, 2], "block_num": 2, "crop_sample_size": crop,
        })
        bdl_arch = dict(planes=(8, 16), stride=(1, 1), nsample=(8, 8),
                        blocks=(2, 2), block_num=2)

        # random-weight checkpoints (pipeline contract, not accuracy)
        key = jax.random.PRNGKey(0)
        feat = jnp.zeros((1, n_sample, 6), jnp.float32)
        lab = jnp.zeros((1, n_sample), jnp.int32)
        fps_mod = task.build_module(cfg)
        fps_vars = jax.jit(fps_mod.init, static_argnames=("train",))(
            key, feat, None, train=False, labels=lab)
        fps_ckpt = str(tmp_path / "fps.npz")
        save_weights(fps_ckpt, dict(fps_vars))
        bdl_mod = TGNet(crop_size=crop, c=6, **bdl_arch)
        bdl_vars = jax.jit(bdl_mod.init, static_argnames=("train",))(
            key, feat, None, train=False, labels=lab)
        bdl_ckpt = str(tmp_path / "bdl.npz")
        save_weights(bdl_ckpt, dict(bdl_vars))

        obj_path = str(tmp_path / "scan_lower.obj")
        write_synthetic_obj(obj_path, n_side=40, seed=1)

        pipe = TgnInferencePipeline(
            fps_ckpt, bdl_ckpt, cfg, bdl_arch=bdl_arch, n_sample=n_sample,
            boundary_info={"bdl_ratio": 0.7, "num_of_bdl_points": 300,
                           "num_of_all_points": n_sample})
        out = pipe(obj_path)
        n_verts = 40 * 40
        assert out["sem"].shape == (n_verts,)
        assert out["ins"].shape == (n_verts,)
        # FDI value range
        valid = set([0] + list(range(11, 19)) + list(range(21, 29)))
        assert set(np.unique(out["sem"])).issubset(valid)
        assert (out["ins"] >= 0).all()

        # overlapped serving: run_many must return per-scan results identical
        # to sequential calls (thread-safety of the jitted fns + host phases)
        outs = pipe.run_many([obj_path, obj_path, obj_path], workers=2)
        assert len(outs) == 3
        for o in outs:
            np.testing.assert_array_equal(o["sem"], out["sem"])
            np.testing.assert_array_equal(o["ins"], out["ins"])


class TestBdlNn1Device:
    """pipelines/tgn.py:_bdl_nn1_fn — the device boundary-1-NN must match the
    host cKDTree it replaces, including sentinel padding never winning."""

    def test_matches_kdtree(self, rng):
        import jax.numpy as jnp
        from scipy.spatial import cKDTree

        from toothgroupnetwork_tpu.pipelines.tgn import _bdl_nn1_fn

        n_pad, n_bd, p_slots = 8192, 1500, 2048
        q = rng.standard_normal((n_pad, 3)).astype(np.float32)
        bdl = rng.standard_normal((n_bd, 3)).astype(np.float32)
        # some queries coincide exactly with boundary points (d2 == 0)
        q[:100] = bdl[:100]
        pad = np.full((p_slots, 3), 1e6, np.float32)
        pad[:n_bd] = bdl

        idx, d2 = jax.device_get(_bdl_nn1_fn(jnp.asarray(q),
                                             jnp.asarray(pad)))
        dist, nn = cKDTree(bdl).query(q, k=1, workers=-1)
        assert (idx < n_bd).all()  # sentinels never win
        np.testing.assert_array_equal(idx, nn)
        np.testing.assert_allclose(d2, dist ** 2, rtol=1e-4, atol=1e-9)
        assert (d2[:100] == 0).all()

        # [Npad,6] query buffer (the purity query's reused fused-FPS upload)
        q6 = np.concatenate([q, np.zeros_like(q)], -1)
        idx6, d26 = jax.device_get(_bdl_nn1_fn(jnp.asarray(q6),
                                               jnp.asarray(pad)))
        np.testing.assert_array_equal(idx6, idx)
        np.testing.assert_array_equal(d26, d2)

    @pytest.mark.parametrize("win_frac", [3, 5])
    def test_window_variant_matches_kdtree(self, rng, tmp_path, win_frac):
        """_bdl_nn1_win_fn (r4: axis-windowed boundary 1-NN) on a synthetic
        SURFACE scan with a band-shaped boundary must reproduce the KD-tree
        1-NN up to exact-distance ties (the CPU path has no bf16 selection).
        Parametrized over the TGN_TPU_WIN_FRAC settings (5 default, 3
        narrow)."""
        import jax.numpy as jnp
        from scipy.spatial import cKDTree
        from synthetic import write_synthetic_obj

        from toothgroupnetwork_tpu.data.mesh_io import parse_obj
        from toothgroupnetwork_tpu.data.scan_prep import \
            normalize_scan_vertices
        from toothgroupnetwork_tpu.pipelines.tgn import _bdl_nn1_win_fn

        p = str(tmp_path / "s_lower.obj")
        write_synthetic_obj(p, n_side=100, seed=0)
        v, _ = parse_obj(p)
        v = normalize_scan_vertices(v).astype(np.float32)
        n0 = v.shape[0]
        n_pad = -(-n0 // 8192) * 8192
        pad = np.zeros((n_pad, 6), np.float32)
        pad[:n0, :3] = v
        # boundary band: vertices near two horizontal lines (tooth-gum-like)
        band = (np.abs(v[:, 1] - 0.1) < 0.05) | (np.abs(v[:, 1] + 0.4) < 0.05)
        bd_rows = np.flatnonzero(band)
        num_bdl, n_bd = 2000, min(len(bd_rows), 1800)
        sel = np.zeros(n0, np.int32)  # only [:num_bdl] is read
        sel[:n_bd] = bd_rows[:n_bd]
        sel_dev = jnp.asarray(sel[:num_bdl] if n0 >= num_bdl
                              else np.pad(sel, (0, num_bdl - n0))[:num_bdl])

        idx, d2 = jax.device_get(_bdl_nn1_win_fn(
            jnp.asarray(pad), sel_dev, n_bd, n0, num_bdl,
            win_frac=win_frac))
        bdl_xyz = v[bd_rows[:n_bd]]
        dist, nn = cKDTree(bdl_xyz).query(v, k=1, workers=-1)
        assert (idx[:n0] < n_bd).all()
        # distance is the contract (index ties may differ); require exact d2
        np.testing.assert_allclose(d2[:n0], dist ** 2, rtol=1e-4, atol=1e-9)
        agree = (idx[:n0] == nn).mean()
        assert agree > 0.999

    @pytest.mark.parametrize("win_frac", [3, 5])
    def test_window_variant_skewed_boundary(self, rng, tmp_path, win_frac):
        """Round-4 advisor: a boundary cloud CONCENTRATED in one axis region
        (vs the org cloud's full span) must still get on-target windows —
        value-aligned starts (r5) center each query slab's window on the
        boundary rows nearest in axis value, where the old boundary-QUANTILE
        alignment pointed e.g. a query at the region's edge at a window
        covering the region's far side. Contract: among the transfer-relevant
        vertices (those whose boundary 1-NN actually beats the sampled-side
        spacing) the windowed d2 must be exact."""
        import jax.numpy as jnp
        from scipy.spatial import cKDTree
        from synthetic import write_synthetic_obj

        from toothgroupnetwork_tpu.data.mesh_io import parse_obj
        from toothgroupnetwork_tpu.data.scan_prep import \
            normalize_scan_vertices
        from toothgroupnetwork_tpu.pipelines.tgn import _bdl_nn1_win_fn

        p = str(tmp_path / "s_lower.obj")
        write_synthetic_obj(p, n_side=100, seed=1)
        v, _ = parse_obj(p)
        v = normalize_scan_vertices(v).astype(np.float32)
        n0 = v.shape[0]
        n_pad = -(-n0 // 8192) * 8192
        pad = np.zeros((n_pad, 6), np.float32)
        pad[:n0, :3] = v
        # skew: ALL boundary points in one corner band of the max-var axis
        ax = int(np.argmax(v.var(axis=0)))
        lo = np.quantile(v[:, ax], 0.05)
        hi = np.quantile(v[:, ax], 0.25)
        band = (v[:, ax] > lo) & (v[:, ax] < hi)
        bd_rows = np.flatnonzero(band)
        num_bdl, n_bd = 2000, min(len(bd_rows), 1800)
        sel = np.zeros(max(n0, num_bdl), np.int32)
        sel[:n_bd] = bd_rows[:n_bd]
        sel_dev = jnp.asarray(sel[:num_bdl])

        idx, d2 = jax.device_get(_bdl_nn1_win_fn(
            jnp.asarray(pad), sel_dev, n_bd, n0, num_bdl,
            win_frac=win_frac))
        bdl_xyz = v[bd_rows[:n_bd]]
        dist, nn = cKDTree(bdl_xyz).query(v, k=1, workers=-1)
        assert (idx[:n0] < n_bd).all()
        # transfer-relevant queries: within a generous sampled-spacing bound
        near = dist < 0.1
        assert near.sum() > 500
        np.testing.assert_allclose(d2[:n0][near], dist[near] ** 2,
                                   rtol=1e-4, atol=1e-9)
        assert (idx[:n0][near] == nn[near]).mean() > 0.999
        # far queries may be window-bounded, but never UNDER-estimate d2
        assert (d2[:n0] >= dist ** 2 - 1e-6).all()

    def test_sel_variant_matches_row_upload(self, rng):
        """_bdl_nn1_sel_fn (in-program gather of the boundary cloud from the
        resident padded org upload via the bdl_sel index) must bit-match the
        row-upload route, and the device-gathered bdl cloud must equal the
        host-built one."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.pipelines.tgn import (_bdl_nn1_fn,
                                                         _bdl_nn1_sel_fn)

        n_org, n_pad, num_bdl, n_all = 5000, 8192, 2048, 3072
        org = rng.standard_normal((n_org, 6)).astype(np.float32)
        org_pad = np.zeros((n_pad, 6), np.float32)
        org_pad[:n_org] = org
        n_bd = 1500
        sel = rng.permutation(n_org)[:n_all].astype(np.int32)

        # host route: sentinel-padded boundary rows
        pad = np.full((num_bdl, 3), 1e6, np.float32)
        pad[:n_bd] = org[sel[:n_bd], :3]
        idx_h, d2_h = jax.device_get(
            _bdl_nn1_fn(jnp.asarray(org_pad), jnp.asarray(pad)))
        idx_s, d2_s = jax.device_get(
            _bdl_nn1_sel_fn(jnp.asarray(org_pad), jnp.asarray(sel),
                            n_bd, num_bdl))
        np.testing.assert_array_equal(idx_s, idx_h)
        np.testing.assert_array_equal(d2_s, d2_h)

        # the device-gathered cloud (bdl_fused_sel's input) == host rows
        np.testing.assert_array_equal(
            np.asarray(jnp.take(jnp.asarray(org_pad), jnp.asarray(sel),
                                axis=0)), org[sel])

    def test_boundary_resample_stashes_global_sel(self, rng):
        """boundary_sampled_feats must stash a device_ctx['bdl_sel'] whose
        org_feats gather reproduces the returned cloud exactly (the pipeline
        re-materializes the cloud on device from this index)."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.postprocess.boundary import (
            _boundary_purity, boundary_sampled_feats)

        n = 3000
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        labels = (pts[:, 0] > 0).astype(np.int64) + 1
        feats = np.concatenate([pts, rng.standard_normal((n, 3))],
                               -1).astype(np.float32)
        bd_mask, _, _, _ = _boundary_purity(pts, pts, labels, 40, 0.7)
        n_pad = 4096
        pad = np.zeros((n_pad, 3), np.float32)
        pad[:n] = pts
        bd_pad = np.zeros(n_pad, bool)
        bd_pad[:n] = bd_mask
        ctx = {"org_pad_dev": jnp.asarray(pad),
               "bd_mask_dev": jnp.asarray(bd_pad), "n_org": n}
        out, lab, n_bd = boundary_sampled_feats(
            labels, feats, feats, bdl_ratio=0.7, num_bdl_points=500,
            num_all_points=1000, device_ctx=ctx)
        sel = ctx["bdl_sel"]
        assert sel.shape == (1000,) and sel.dtype == np.int32
        np.testing.assert_array_equal(feats[sel], out)
