"""Train state + optimizer factory.

Optimizer semantics match the reference's torch optimizers (base_model.py:16-19):
  * adam: lr, L2 weight decay folded into the gradient (torch ``weight_decay``
    convention — not decoupled AdamW),
  * sgd: momentum + L2 weight decay.
The learning rate is injected via ``optax.inject_hyperparams`` so the per-epoch
scheduler can update it without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from .config import OptimizerConfig


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.name == "adam":
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
            )
    elif cfg.name == "sgd":
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.trace(decay=cfg.momentum, nesterov=False),
                optax.scale_by_learning_rate(learning_rate),
            )
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    return optax.inject_hyperparams(make)(learning_rate=cfg.lr)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def set_learning_rate(self, lr: float) -> "TrainState":
        opt_state = self.opt_state
        hyper = dict(opt_state.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return self.replace(opt_state=opt_state._replace(hyperparams=hyper))

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])


def create_train_state(module, opt_cfg: OptimizerConfig, sample_input: dict,
                       rng: jax.Array, forward_kwargs: dict | None = None,
                       ) -> TrainState:
    """Initialize params/batch_stats from a sample batch dict with keys
    ``feat [B,N,C]`` and ``mask [B,N]`` (plus whatever else the module consumes).
    ``forward_kwargs``: extra module-call kwargs drawn from the batch (e.g. tgnet
    needs ``labels``). init is jitted — eager op-by-op dispatch through the TPU
    tunnel is pathologically slow."""
    init_fn = jax.jit(module.init, static_argnames=("train",))
    variables = init_fn(rng, sample_input["feat"], sample_input.get("mask"),
                        train=False, **(forward_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(opt_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=module.apply,
        tx=tx,
    )
