"""Orbax checkpointing: full resumable train state, plus weights-only export.

Upgrade over the reference, which saves weights-only ``state_dict`` .h5 files each
epoch + on best-val (base_model.py:39-48; trainer.py:47,60-63) and cannot resume
optimizer/scheduler/epoch (SURVEY.md §5 "Checkpoint / resume"). We keep the same
two-slot layout (``<ckpt>`` latest / ``<ckpt>_val`` best) but store everything.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_train_checkpoint(path: str, state: TrainState, epoch: int,
                          extra: dict | None = None):
    """Save the full train state + metadata at ``path`` (a directory)."""
    path = _abs(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    meta = {"epoch": int(epoch)}
    if extra:
        meta.update(extra)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def restore_train_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    """Restore into an existing (freshly initialized) state; returns (state, epoch)."""
    path = _abs(path)
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(path, item=template)
    epoch = 0
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            epoch = json.load(f).get("epoch", 0)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    ), epoch


def save_weights(path: str, state_or_vars) -> None:
    """Weights-only export for inference (the reference's .h5 analog): a single
    ``.npz`` of flattened param/batch_stats leaves — dependency-free to reload."""
    if isinstance(state_or_vars, TrainState):
        variables = {"params": state_or_vars.params,
                     "batch_stats": state_or_vars.batch_stats}
    else:
        variables = state_or_vars
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(_abs(path)) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_weights(path: str, variables_template) -> dict:
    """Reload a weights-only .npz into the structure of ``variables_template``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(variables_template)
    flat_template, treedef = leaves_with_paths
    new_leaves = []
    for keypath, leaf in flat_template:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if key not in data:
            raise KeyError(f"checkpoint missing {key!r}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
