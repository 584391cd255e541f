"""Model family tests: forward shapes, finiteness, mask invariance, and one
gradient-step sanity check per family on small synthetic clouds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.models import get_task, available_models
from toothgroupnetwork_tpu.models.dgcnn import edge_conv_feature
from toothgroupnetwork_tpu.train.trainer import make_train_step
from toothgroupnetwork_tpu.train.train_state import create_train_state


def _small_cfg(name):
    task = get_task(name)
    cfg = task.default_config()
    if name == "pointnet":
        cfg.model_parameter["scale"] = 1
    if name == "pointnetpp":
        cfg.model_parameter["scale"] = 1
    if name == "dgcnn":
        cfg.model_parameter["k"] = 8
    return task, cfg


def _batch(rng, b=1, n=2048, pad=0):
    feat = rng.standard_normal((b, n, 6)).astype(np.float32) * 0.3
    mask = np.ones((b, n), bool)
    if pad:
        mask[:, n - pad:] = False
    labels = rng.integers(-1, 16, (b, n)).astype(np.int32)
    return {"feat": feat, "gt_seg_label": labels, "mask": mask}


@pytest.mark.parametrize("name", ["pointnetpp", "dgcnn"])
class TestForward:
    def test_shapes_and_finite(self, name, rng):
        task, cfg = _small_cfg(name)
        module = task.build_module(cfg)
        batch = _batch(rng)
        variables = module.init(jax.random.PRNGKey(0), jnp.array(batch["feat"]),
                                jnp.array(batch["mask"]), False)
        out = module.apply(variables, jnp.array(batch["feat"]),
                           jnp.array(batch["mask"]), False)
        assert out["cls_pred"].shape == (1, 2048, 17)
        assert bool(jnp.isfinite(out["cls_pred"]).all())
        if "offset" in out:
            assert out["offset"].shape == (1, 2048, 3)
            # zero-init offset/dist heads (pointnet_pp.py:35-36 contract)
            np.testing.assert_allclose(np.asarray(out["offset"]), 0.0, atol=1e-6)

    def test_one_train_step(self, name, rng):
        task, cfg = _small_cfg(name)
        module = task.build_module(cfg)
        batch = _batch(rng, n=1536)
        state = create_train_state(module, cfg.optimizer, batch,
                                   jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(task, cfg))
        state2, values = step(state, batch)
        assert np.isfinite(float(values["tooth_class_loss_1"]))
        # params actually moved
        l0 = jax.tree_util.tree_leaves(state.params)[0]
        l1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert not np.allclose(np.asarray(l0), np.asarray(l1))


class TestMaskInvariance:
    def test_dgcnn_padding_does_not_change_valid_logits(self, rng):
        """Padded points must not alter predictions for valid points."""
        task, cfg = _small_cfg("dgcnn")
        module = task.build_module(cfg)
        n, pad = 512, 128
        feat = rng.standard_normal((1, n, 6)).astype(np.float32) * 0.3
        mask_full = np.ones((1, n), bool)
        mask_pad = mask_full.copy()
        mask_pad[:, n - pad:] = False

        variables = module.init(jax.random.PRNGKey(0), jnp.array(feat),
                                jnp.array(mask_full), False)
        out_ref = module.apply(variables, jnp.array(feat[:, :n - pad]),
                               jnp.array(mask_full[:, :n - pad]), False)
        garbage = feat.copy()
        garbage[:, n - pad:] = 1e3
        out_pad = module.apply(variables, jnp.array(garbage),
                               jnp.array(mask_pad), False)
        np.testing.assert_allclose(
            np.asarray(out_pad["cls_pred"])[0, :n - pad],
            np.asarray(out_ref["cls_pred"])[0],
            atol=1e-3)


class TestEdgeConv:
    def test_graph_feature_contract(self, rng):
        x = jnp.array(rng.standard_normal((1, 16, 4)).astype(np.float32))
        g = edge_conv_feature(x, 3)
        assert g.shape == (1, 16, 3, 8)
        # nearest neighbor of each point is itself -> first slot diff is 0, center = x
        np.testing.assert_allclose(np.asarray(g[0, :, 0, :4]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g[0, :, 0, 4:]), np.asarray(x[0]),
                                   atol=1e-6)


class TestRegistryComplete:
    def test_families_registered(self):
        have = set(available_models())
        assert {"pointnet", "pointnetpp", "dgcnn"}.issubset(have)
