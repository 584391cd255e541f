"""tgnet two-stage model + loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.losses.tgn_loss import (
    batch_center_offset_loss, batch_chamfer_distance_loss)
from toothgroupnetwork_tpu.models import get_task
from toothgroupnetwork_tpu.models.tgnet import (
    TGNet, binary_crop_labels, gt_tooth_centroids, half_arch_labels, make_crops)

from synthetic import make_synthetic_jaw_points


def np_center_offset_loss(offset, xyz, gt):
    """Literal reimplementation of tgn_loss.py:6-61 for parity checking."""
    B = offset.shape[0]
    c_losses = d_losses = 0.0
    c_count = d_count = 0
    for b in range(B):
        for t in range(16):
            cond = gt[b] == t
            pts = xyz[b][cond]
            if pts.shape[0] < 5:
                continue
            c_count += 1
            off = offset[b][cond]
            cent = pts.mean(0)
            moved = pts + off
            c_losses += (((moved - cent) ** 2).sum(-1)).sum() / pts.shape[0]
            on = np.linalg.norm(off, axis=1)
            od = off / on[:, None]
            tc = cent - pts
            tcd = tc / np.linalg.norm(tc, axis=1)[:, None]
            sel = on > 2e-4
            if sel.sum() > 0:
                d_count += 1
                dot = (od[sel] * tcd[sel]).sum(-1) - 1
                d_losses += (dot * dot).sum() / sel.sum()
    return c_losses / max(c_count, 1), d_losses / max(d_count, 1)


def np_chamfer_loss(offset, xyz, gt):
    """Literal reimplementation of tgn_loss.py:263-302."""
    B = offset.shape[0]
    loss = 0.0
    for b in range(B):
        cents = []
        for t in range(16):
            pts = xyz[b][gt[b] == t]
            if pts.shape[0] < 5:
                continue
            cents.append(pts.mean(0))
        cents = np.stack(cents)
        moved = (xyz[b] + offset[b])[gt[b] != -1]
        d = ((moved[:, None, :] - cents[None]) ** 2).sum(-1)
        d.sort(axis=-1)
        loss += (d[:, 0] / d[:, 1]).sum() / moved.shape[0]
    return loss / B


class TestTgnLossParity:
    def test_offset_loss_matches_reference_algorithm(self, rng):
        pts, _, cls = make_synthetic_jaw_points(600, 8, seed=3)
        gt = (cls - 1).astype(np.int32)[None]  # -1 gingiva
        xyz = pts[None]
        offset = rng.standard_normal((1, 600, 3)).astype(np.float32) * 0.05
        got_c, got_d = batch_center_offset_loss(
            jnp.array(offset), jnp.array(xyz), jnp.array(gt))
        want_c, want_d = np_center_offset_loss(offset, xyz, gt)
        np.testing.assert_allclose(float(got_c), want_c, rtol=1e-4)
        np.testing.assert_allclose(float(got_d), want_d, rtol=1e-4)

    def test_chamfer_matches_reference_algorithm(self, rng):
        pts, _, cls = make_synthetic_jaw_points(600, 8, seed=4)
        gt = (cls - 1).astype(np.int32)[None]
        xyz = pts[None]
        offset = rng.standard_normal((1, 600, 3)).astype(np.float32) * 0.05
        got = batch_chamfer_distance_loss(
            jnp.array(offset), jnp.array(xyz), jnp.array(gt))
        want = np_chamfer_loss(offset, xyz, gt)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    def test_perfect_offsets_near_zero_loss(self, rng):
        pts, _, cls = make_synthetic_jaw_points(600, 8, seed=5)
        gt = (cls - 1).astype(np.int32)[None]
        xyz = pts[None]
        # offset = exact vector to tooth centroid
        offset = np.zeros_like(xyz)
        for t in range(16):
            cond = gt[0] == t
            if cond.sum():
                offset[0][cond] = xyz[0][cond].mean(0) - xyz[0][cond]
        c, d = batch_center_offset_loss(jnp.array(offset), jnp.array(xyz),
                                        jnp.array(gt))
        assert float(c) < 1e-6
        assert float(d) < 1e-6


class TestLabelTransforms:
    def test_half_arch(self):
        lab = jnp.array([-1, 0, 8, 9, 15])
        np.testing.assert_array_equal(np.asarray(half_arch_labels(lab)),
                                      [-1, 0, 8, 1, 7])

    def test_binary_crop(self):
        lab = jnp.array([-1, 0, 5, 15])
        np.testing.assert_array_equal(np.asarray(binary_crop_labels(lab)),
                                      [-1, 0, 0, 0])


class TestCrops:
    def test_gt_centroids(self, rng):
        pts, _, cls = make_synthetic_jaw_points(400, 4, seed=0)
        gt = (cls - 1).astype(np.int32)[None]
        cent, valid = gt_tooth_centroids(jnp.array(pts[None]), jnp.array(gt))
        assert cent.shape == (1, 16, 3) and valid.shape == (1, 16)
        assert int(valid.sum()) == 4
        for t in range(16):
            if bool(valid[0, t]):
                want = pts[gt[0] == t].mean(0)
                np.testing.assert_allclose(np.asarray(cent[0, t]), want, atol=1e-5)
            else:
                assert (np.asarray(cent[0, t]) == 1e3).all()

    def test_make_crops_centered_and_masked(self, rng):
        pts, _, cls = make_synthetic_jaw_points(500, 4, seed=1)
        gt = (cls - 1).astype(np.int32)[None]
        feat = np.concatenate([pts, np.ones_like(pts)], -1)[None]
        cent, valid = gt_tooth_centroids(jnp.array(pts[None]), jnp.array(gt))
        crop, crop_mask, idx, crop_labels = make_crops(
            jnp.array(feat), cent, valid, 64, extra=jnp.array(gt))
        assert crop.shape == (16, 64, 6)
        assert crop_mask.shape == (16, 64)
        # per-crop xyz centered
        np.testing.assert_allclose(np.asarray(crop[:, :, :3].mean(axis=1)), 0.0,
                                   atol=1e-5)
        # valid crops mask matches tooth presence
        np.testing.assert_array_equal(np.asarray(crop_mask[:, 0]),
                                      np.asarray(valid[0]))
        assert crop_labels.shape == (16, 64)


class TestTGNetEndToEnd:
    def test_forward_and_train_step(self, rng):
        from toothgroupnetwork_tpu.train.train_state import create_train_state
        from toothgroupnetwork_tpu.train.trainer import make_train_step

        task = get_task("tgnet_fps")
        cfg = task.default_config()
        cfg.model_parameter.update({
            "planes": [8, 16], "stride": [1, 4], "nsample": [8, 8],
            "blocks": [2, 2], "block_num": 2, "crop_sample_size": 64,
        })
        pts, _, cls = make_synthetic_jaw_points(512, 8, seed=2)
        batch = {
            "feat": np.concatenate(
                [pts, np.tile([0, 0, 1.0], (512, 1)).astype(np.float32)],
                -1)[None],
            "gt_seg_label": (cls - 1).astype(np.int32)[None],
            "mask": np.ones((1, 512), bool),
        }
        module = task.build_module(cfg)
        state = create_train_state(module, cfg.optimizer, batch,
                                   jax.random.PRNGKey(0),
                                   task.forward_kwargs(batch))
        step = jax.jit(make_train_step(task, cfg))
        state2, values = step(state, batch)
        expected = {"tooth_class_loss_1", "tooth_class_loss_2", "offset_1_loss",
                    "offset_1_dir_loss", "chamf_1_loss", "cbl_loss_1",
                    "cbl_loss_2"}
        assert set(values) == expected
        for k, v in values.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        # second step decreases total (sanity, not strict)
        state3, values2 = step(state2, batch)
        assert np.isfinite(float(values2["tooth_class_loss_1"]))
