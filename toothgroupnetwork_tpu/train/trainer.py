"""Trainer: jitted train/eval steps, per-epoch cosine LR, checkpoint slots, logging,
data-parallel sharding over a device mesh.

Replaces the reference's Trainer (trainer.py:5-101) and runner (runner.py:26-57):
  * same loop contract — epochs of train() + test(save_best_model=True), per-epoch
    scheduler stepping, latest + best-val checkpoint slots, ``<loss>_{train,step,val}``
    log naming — but the step is one compiled XLA program instead of eager torch with
    ``empty_cache()`` per batch (trainer.py:32),
  * true batching and data parallelism: batches shard over the ``data`` axis of a
    ``jax.sharding.Mesh`` (the reference is single-GPU batch-1, SURVEY.md §2.8).
"""

from __future__ import annotations

import time
from typing import TYPE_CHECKING

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .checkpoints import restore_train_checkpoint, save_train_checkpoint

if TYPE_CHECKING:  # avoid a models<->train import cycle; ModelTask is typing-only here
    from ..models.registry import ModelTask
from .loss_meter import LossMap, LossMeter
from .schedule import PlateauLR, make_epoch_lr_fn
from .train_state import TrainState, create_train_state


def make_train_step(task: "ModelTask", config):
    """Build the jitted train step: forward (train mode, mutable batch_stats),
    weighted-loss sum, grad, optimizer update."""
    base_key = jax.random.PRNGKey(config.seed + 1)

    def train_step(state: TrainState, batch: dict):
        step_rng = jax.random.fold_in(base_key, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = state.apply_fn(
                variables, batch["feat"], batch.get("mask"), True,
                mutable=["batch_stats"], rngs={"dropout": step_rng},
                **task.forward_kwargs(batch))
            losses = task.compute_losses(outputs, batch, config)
            total = LossMap(losses).get_sum()
            values = {k: v for k, (v, _) in losses.items()}
            return total, (values, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (values, new_stats)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return state, values

    return train_step


def make_eval_step(task: "ModelTask", config):
    def eval_step(state: TrainState, batch: dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = state.apply_fn(variables, batch["feat"], batch.get("mask"), False,
                                 **task.forward_kwargs(batch))
        losses = task.compute_losses(outputs, batch, config)
        return {k: v for k, (v, _) in losses.items()}

    return eval_step


class Trainer:
    def __init__(self, config, task: "ModelTask", train_loader,
                 val_loader, log_fn=print):
        from ..parallel.distributed import maybe_initialize
        from ..utils.compile_cache import ensure_compile_cache

        maybe_initialize(config)  # multi-host DCN init when config enables it
        ensure_compile_cache()  # TPU-only persistent XLA cache (warm starts)
        self.config = config
        self.task = task
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.log = log_fn
        self.lr_fn = make_epoch_lr_fn(config.optimizer, config.scheduler)

        module = task.build_module(config)
        sample = next(iter(train_loader))
        sample = {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}
        init_batch = self._device_batch(sample, init=True)
        self.state = create_train_state(
            module, config.optimizer, init_batch,
            jax.random.PRNGKey(config.seed), task.forward_kwargs(init_batch))

        ndev = config.data_parallel
        if ndev > 1:
            devices = np.array(jax.devices()[:ndev])
            self.mesh = Mesh(devices, ("data",))
            self.batch_sharding = NamedSharding(self.mesh, P("data"))
            self.replicated = NamedSharding(self.mesh, P())
            self.state = jax.device_put(self.state, self.replicated)
            self._train_step = jax.jit(
                make_train_step(task, config), donate_argnums=0,
                out_shardings=(self.replicated, self.replicated))
            self._eval_step = jax.jit(make_eval_step(task, config))
        else:
            self.mesh = None
            self._train_step = jax.jit(make_train_step(task, config), donate_argnums=0)
            self._eval_step = jax.jit(make_eval_step(task, config))

        self.best_val = float("inf")
        self.epoch = 0
        self.step_count = 0  # scheduler-step counter (reference step_count)
        self.wandb = None
        if config.wandb_on:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=config.wandb_project, name=config.experiment_name,
                           config=config.to_dict())
            except Exception as e:  # wandb genuinely optional
                self.log(f"wandb disabled: {e}")

    def _device_batch(self, batch: dict, init: bool = False,
                      shard: bool = True) -> dict:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        arrays.setdefault(
            "mask", np.ones(arrays["feat"].shape[:2], dtype=bool))
        if not init and shard and self.mesh is not None:
            arrays = {k: jax.device_put(v, self.batch_sharding)
                      for k, v in arrays.items()}
        return arrays

    def _shard_arrays(self, arrays: dict) -> dict:
        """Shard batch-leading host arrays over the data mesh (no-op single-chip)."""
        if self.mesh is None:
            return arrays
        return {k: (jax.device_put(v, self.batch_sharding)
                    if isinstance(v, (np.ndarray, jax.Array)) else v)
                for k, v in arrays.items()}

    def train_epoch(self) -> dict:
        meter = LossMeter()
        step_meter = LossMeter()
        step_every = self.config.scheduler.step_batches
        pre_step = self.step_count
        try:
            n_batches = len(self.train_loader)
        except TypeError:
            n_batches = -1  # unsized loader: no epoch-end fallback fire
        for batch_idx, batch in enumerate(self.train_loader):
            db = self._device_batch(batch)
            if self.task.host_stage is not None:
                # host stages may need non-array fields (mesh_path, augmenter);
                # their replacement arrays come back as host numpy and must be
                # re-sharded over the data mesh like the originals (otherwise
                # tgnet_bdl/tsegnet feat/labels enter the jitted step unsharded)
                db.update(self._shard_arrays(
                    self.task.host_stage(self.state, {**batch, **db},
                                         self.config)))
            self.state, values = self._train_step(self.state, db)
            weighted = {f"{k}_step": float(v) * self._weight(k)
                        for k, v in values.items()}
            weighted["total_step"] = sum(weighted.values())
            meter.aggr(weighted)
            if step_every > 0:
                # per-N-batch scheduler stepping + step-frequency logging
                # (reference trainer.py:36-41: fire every schedueler_step
                # batches, or once at epoch end if it never fired)
                step_meter.aggr(weighted)
                if ((batch_idx + 1) % step_every == 0
                        or (self.step_count == pre_step
                            and batch_idx == n_batches - 1)):
                    lr = self.lr_fn(self.step_count) \
                        if not isinstance(self.lr_fn, PlateauLR) else self.lr_fn.lr
                    if self.wandb:
                        self.wandb.log(step_meter.get_avg_results(),
                                       step=self.step_count)
                        self.wandb.log({"step_lr": lr}, step=self.step_count)
                    self.step_count += 1
                    if not isinstance(self.lr_fn, PlateauLR):
                        self.state = self.state.set_learning_rate(
                            self.lr_fn(self.step_count))
                    step_meter = LossMeter()
        return {k.replace("_step", "_train"): v
                for k, v in meter.get_avg_results().items()}

    def eval_epoch(self) -> dict:
        meter = LossMeter()
        for batch in self.val_loader:
            # Partial val batches are padded by repeating item 0 and flagged via
            # batch_valid; slice the padding off so it can't bias the val loss
            # (and hence best-checkpoint selection). The smaller trailing batch
            # costs one extra eval compile and skips mesh sharding (its size need
            # not divide the device count).
            bv = batch.pop("batch_valid", None)
            if bv is not None and not bv.all():
                n_valid = int(bv.sum())
                batch = {
                    k: (v[:n_valid]
                        if (isinstance(v, np.ndarray) or isinstance(v, list))
                        and len(v) == len(bv) else v)
                    for k, v in batch.items()
                }
                shard = False
            else:
                n_valid = len(batch["feat"])
                shard = True
            db = self._device_batch(batch, shard=shard)
            if self.task.host_stage is not None:
                out = self.task.host_stage(self.state, {**batch, **db},
                                           self.config)
                db.update(self._shard_arrays(out) if shard else out)
            values = self._eval_step(self.state, db)
            weighted = {f"{k}_val": float(v) * self._weight(k)
                        for k, v in values.items()}
            weighted["total_val"] = sum(weighted.values())
            meter.aggr(weighted, weight=n_valid)
        return meter.get_avg_results()

    def _weight(self, name: str) -> float:
        return self.config.loss_weights.get(name, 1.0)

    def _run_one_epoch(self):
        self.state = self.state.set_learning_rate(self.lr_fn(self.epoch))
        t0 = time.perf_counter()
        train_stats = self.train_epoch()
        val_stats = self.eval_epoch()
        dt = time.perf_counter() - t0
        if isinstance(self.lr_fn, PlateauLR):
            # plateau decays on the val metric (scheduler_factory.py:89-101)
            self.lr_fn(self.epoch, metric=val_stats.get("total_val"))
        stats = {**train_stats, **val_stats,
                 "lr": self.lr_fn(self.epoch), "epoch_time_s": dt}
        self.log(f"epoch {self.epoch}: " +
                 " ".join(f"{k}={v:.5f}" for k, v in stats.items()))
        if self.wandb:
            self.wandb.log(stats, step=self.epoch)

        save_train_checkpoint(self.config.checkpoint_path, self.state,
                              self.epoch)
        if val_stats.get("total_val", float("inf")) < self.best_val:
            self.best_val = val_stats["total_val"]
            save_train_checkpoint(self.config.checkpoint_path + "_val",
                                  self.state, self.epoch,
                                  {"best_val": self.best_val})
        self.epoch += 1

    def run(self, max_epochs: int | None = None):
        """Epoch loop (reference trainer.py:96-101: infinite; bound it via
        config). With ``config.elastic_retries > 0``, an epoch failure
        (preempted chip, flaky IO, transient OOM) restores the last
        checkpoint and retries — full-state Orbax resume makes the recovery
        exact up to the failed epoch's partial work."""
        total = max_epochs if max_epochs is not None else self.config.max_epochs
        end = self.epoch + total
        failures = 0
        while self.epoch < end:
            try:
                self._run_one_epoch()
                failures = 0  # a completed epoch resets the retry budget
            except KeyboardInterrupt:
                raise
            except Exception as e:
                failures += 1
                if failures > self.config.elastic_retries:
                    raise
                self.log(f"epoch {self.epoch} failed ({e!r}); restoring last "
                         f"checkpoint and retrying "
                         f"({failures}/{self.config.elastic_retries})")
                try:
                    self.resume()  # rolls state AND epoch back to last saved
                except Exception:
                    # nothing checkpointed yet: retry the epoch with the
                    # current (partially-advanced) in-memory state
                    self.log("no checkpoint to restore; retrying in place")
        return self.state

    def resume(self):
        self.state, epoch = restore_train_checkpoint(
            self.config.checkpoint_path, self.state)
        self.epoch = epoch + 1
        return self.epoch
