"""Multi-host (pod-scale) initialization over DCN.

The reference is strictly single-process/single-GPU (SURVEY.md §2.8: no
torch.distributed/NCCL/MPI anywhere); pod-scale training here uses the standard
JAX runtime: ``jax.distributed.initialize`` connects the hosts over DCN, after
which ``jax.devices()`` spans the whole slice and the Trainer's ``data`` mesh +
``NamedSharding`` compile to ICI collectives within a slice and DCN transfers
across slices — no explicit communication code.

Config contract (:class:`~toothgroupnetwork_tpu.train.config.DistributedConfig`):
``enabled`` gates everything (single-host default stays zero-overhead);
coordinator address / process counts may be omitted where the TPU runtime
provides them through the environment (GKE/TPU-VM metadata), matching
``jax.distributed.initialize``'s auto-detection.
"""

from __future__ import annotations

import jax

_INITIALIZED = False


def maybe_initialize(config) -> bool:
    """Initialize the JAX distributed runtime once, iff the config enables it.

    Returns True when running multi-host (process_count > 1) after the call.
    Safe to call repeatedly and from single-host runs (no-op).
    """
    global _INITIALIZED
    dist = getattr(config, "distributed", None)
    if dist is None or not dist.enabled:
        return jax.process_count() > 1
    if not _INITIALIZED:
        kwargs = {}
        if dist.coordinator_address:
            kwargs["coordinator_address"] = dist.coordinator_address
        if dist.num_processes:
            kwargs["num_processes"] = dist.num_processes
        if dist.process_id is not None:
            kwargs["process_id"] = dist.process_id
        jax.distributed.initialize(**kwargs)
        _INITIALIZED = True
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of a global batch laid out
    contiguously per process — the standard multi-host input-pipeline split."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per
