"""Model registry: name → ModelTask (module builder + loss computation + preset).

The TPU-native replacement for the reference's L4 model-wrapper layer
(models/base_model.py + 7 concrete wrappers, SURVEY.md §2.4): instead of classes owning
an optimizer and a ``.step()``, a task is pure data + pure functions consumed by the
shared jitted Trainer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ..train.config import TrainConfig

# compute_losses(outputs, batch, config) -> {name: (value, weight)}
LossFn = Callable[[dict, dict, TrainConfig], dict]


@dataclass
class ModelTask:
    name: str
    build_module: Callable[[TrainConfig], Any]
    compute_losses: LossFn
    default_config: Callable[[], TrainConfig]
    # extra forward kwargs drawn from the batch (e.g. tgnet needs labels for
    # GT-centroid cropping at train time): batch -> kwargs dict
    forward_kwargs: Callable[[dict], dict] = field(default=lambda batch: {})
    # optional host-side stage run before each jitted step, returning extra batch
    # arrays: (state, batch, config) -> dict. Used by tsegnet, whose crop proposals
    # come from DBSCAN over its own centroid predictions (data-dependent, host-side;
    # the reference runs sklearn inside its eager forward, tsegnet.py:57-71).
    host_stage: Callable | None = field(default=None)


_REGISTRY: dict[str, ModelTask] = {}


def register_task(task: ModelTask):
    _REGISTRY[task.name] = task
    return task


def get_task(name: str) -> ModelTask:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_models() -> list[str]:
    return sorted(_REGISTRY)
