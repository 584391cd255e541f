"""Point-transformer backbone + CBL tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.models.point_transformer import PointTransformerSeg
from toothgroupnetwork_tpu.losses.cbl_loss import cbl_loss, cbl_loss_per_stage
from toothgroupnetwork_tpu.models import get_task


def _small_model(k=10, block_num=3):
    return PointTransformerSeg(
        k=k, c=6, planes=(8, 16, 32, 64, 128)[:block_num] if block_num < 5 else
        (8, 16, 32, 64, 128),
        stride=(1, 4, 4, 4, 4)[:block_num],
        nsample=(8, 8, 8, 8, 8)[:block_num],
        blocks=(2, 2, 2, 2, 2)[:block_num],
        block_num=block_num,
    )


def _feat(rng, b=1, n=256):
    return (rng.standard_normal((b, n, 6)).astype(np.float32) * 0.3,
            np.ones((b, n), bool))


class TestBackbone:
    @pytest.mark.parametrize("block_num", [2, 3, 5])
    def test_forward_shapes(self, rng, block_num):
        m = _small_model(k=10, block_num=block_num)
        feat, mask = _feat(rng, n=512)
        variables = m.init(jax.random.PRNGKey(0), jnp.array(feat),
                           jnp.array(mask), False)
        out = m.apply(variables, jnp.array(feat), jnp.array(mask), False)
        assert out["sem_1"].shape == (1, 512, 10)
        assert out["offset_1"].shape == (1, 512, 3)
        assert out["embed"].shape == (1, 512, 8)
        assert len(out["cbl_stages"]) == block_num
        # stage sizes follow the stride schedule
        sizes = [st["p"].shape[1] for st in out["cbl_stages"]]
        want = [512]
        for s in (1, 4, 4, 4, 4)[1:block_num]:
            want.append(want[-1] // s)
        assert sizes == want
        assert bool(jnp.isfinite(out["sem_1"]).all())

    def test_batched(self, rng):
        m = _small_model(block_num=2)
        feat, mask = _feat(rng, b=3, n=128)
        variables = m.init(jax.random.PRNGKey(0), jnp.array(feat),
                           jnp.array(mask), False)
        out = m.apply(variables, jnp.array(feat), jnp.array(mask), False)
        assert out["sem_1"].shape == (3, 128, 10)


class TestCBL:
    def test_stages_and_finite(self, rng):
        m = _small_model(block_num=3)
        feat, mask = _feat(rng, n=256)
        labels = rng.integers(-1, 9, (1, 256)).astype(np.int32)
        variables = m.init(jax.random.PRNGKey(0), jnp.array(feat),
                           jnp.array(mask), True)
        out, _ = m.apply(variables, jnp.array(feat), jnp.array(mask), True,
                         mutable=["batch_stats"])
        losses = cbl_loss_per_stage(out["cbl_stages"], jnp.array(labels), 10,
                                    (1, 4, 4))
        assert len(losses) == 3
        for l in losses:
            assert np.isfinite(float(l))
        total = cbl_loss(out["cbl_stages"], jnp.array(labels), 10, (1, 4, 4))
        np.testing.assert_allclose(float(total),
                                   sum(float(l) for l in losses), rtol=1e-6)

    def test_uniform_labels_zero_loss(self, rng):
        """All-same labels -> no row has both pos and neg -> loss 0."""
        m = _small_model(block_num=2)
        feat, mask = _feat(rng, n=128)
        labels = np.zeros((1, 128), np.int32)
        variables = m.init(jax.random.PRNGKey(0), jnp.array(feat),
                           jnp.array(mask), True)
        out, _ = m.apply(variables, jnp.array(feat), jnp.array(mask), True,
                         mutable=["batch_stats"])
        losses = cbl_loss_per_stage(out["cbl_stages"], jnp.array(labels), 10,
                                    (1, 4))
        for l in losses:
            assert float(l) == pytest.approx(0.0, abs=1e-6)

    def test_grad_flows(self, rng):
        m = _small_model(block_num=2)
        feat, mask = _feat(rng, n=128)
        labels = jnp.array(rng.integers(-1, 9, (1, 128)).astype(np.int32))
        variables = m.init(jax.random.PRNGKey(0), jnp.array(feat),
                           jnp.array(mask), True)

        def loss_fn(params):
            out, _ = m.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             jnp.array(feat), jnp.array(mask), True,
                             mutable=["batch_stats"])
            return cbl_loss(out["cbl_stages"], labels, 10, (1, 4))

        g = jax.grad(loss_fn)(variables["params"])
        gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gsum) and gsum > 0


class TestTask:
    def test_pointtransformer_registered_and_trains(self, rng):
        from toothgroupnetwork_tpu.train.train_state import create_train_state
        from toothgroupnetwork_tpu.train.trainer import make_train_step

        task = get_task("pointtransformer")
        cfg = task.default_config()
        cfg.model_parameter.update({
            "planes": [8, 16], "stride": [1, 4], "nsample": [8, 8],
            "blocks": [2, 2], "block_num": 2,
        })
        module = task.build_module(cfg)
        batch = {
            "feat": rng.standard_normal((1, 256, 6)).astype(np.float32) * 0.3,
            "gt_seg_label": rng.integers(-1, 16, (1, 256)).astype(np.int32),
            "mask": np.ones((1, 256), bool),
        }
        state = create_train_state(module, cfg.optimizer, batch,
                                   jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(task, cfg))
        state2, values = step(state, batch)
        assert np.isfinite(float(values["tooth_class_loss_1"]))


class TestCellAttention:
    """Super-row candidate gathers (ops/cells.py + cell_select kernels) wired
    into the backbone: eval forward with cell_attention=True on a spatially
    sorted cloud must match the regular-gather forward."""

    def test_eval_parity_on_sorted_cloud(self, rng):
        from toothgroupnetwork_tpu.models.point_transformer.backbone import (
            PointTransformerSeg)
        from toothgroupnetwork_tpu.ops.cells import spatial_sort_perm

        n = 512
        u1 = rng.uniform(-1, 1, n)
        u2 = rng.uniform(-1, 1, n)
        xyz = np.stack([u1, 0.3 * u1 ** 2 + 0.2 * u2 ** 2, u2], 1)
        xyz = (xyz + rng.normal(0, 0.01, xyz.shape)).astype(np.float32)
        xyz = xyz[spatial_sort_perm(xyz, slab=128)]
        feat = np.concatenate(
            [xyz, rng.standard_normal((n, 3)).astype(np.float32) * 0.1], 1)

        kw = dict(k=10, planes=(8, 16), stride=(1, 4), nsample=(12, 8),
                  blocks=(2, 2), block_num=2)
        ref = PointTransformerSeg(**kw, cell_attention=False)
        cell = PointTransformerSeg(**kw, cell_attention=True, cell_slots=24)
        variables = ref.init(jax.random.PRNGKey(0), jnp.asarray(feat[None]),
                             None, train=False)
        out_ref = ref.apply(variables, jnp.asarray(feat[None]), None, False)
        out_cell = cell.apply(variables, jnp.asarray(feat[None]), None, False)
        # identical params; the only difference is the gather mechanism.
        # L=24 covers every candidate cell at k=12 on a sorted cloud, so the
        # outputs agree to float tolerance.
        np.testing.assert_allclose(np.asarray(out_cell["sem_1"]),
                                   np.asarray(out_ref["sem_1"]),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out_cell["offset_1"]),
                                   np.asarray(out_ref["offset_1"]),
                                   atol=2e-4, rtol=1e-4)

    def test_train_mode_ignores_flag(self, rng):
        from toothgroupnetwork_tpu.models.point_transformer.backbone import (
            PointTransformerSeg)

        n = 128
        feat = rng.standard_normal((1, n, 6)).astype(np.float32) * 0.3
        kw = dict(k=10, planes=(8, 16), stride=(1, 4), nsample=(8, 8),
                  blocks=(2, 2), block_num=2)
        ref = PointTransformerSeg(**kw, cell_attention=False)
        cell = PointTransformerSeg(**kw, cell_attention=True)
        variables = ref.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                             None, train=True)
        o1, _ = ref.apply(variables, jnp.asarray(feat), None, True,
                          mutable=["batch_stats"])
        o2, _ = cell.apply(variables, jnp.asarray(feat), None, True,
                           mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(o1["sem_1"]),
                                      np.asarray(o2["sem_1"]))
