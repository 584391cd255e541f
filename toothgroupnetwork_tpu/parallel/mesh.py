"""Device mesh + sharding helpers.

Data parallelism: batch sharded over a ``data`` mesh axis, parameters replicated,
gradients reduced by XLA-inserted collectives over ICI (SURVEY.md §2.8 item 1-2).

Point-axis sharding (the sequence/context-parallel analog, §2.8 item 3): for the
O(M·N) pairwise ops, shard the POINT axis over a ``model`` axis with ``shard_map``;
each device computes its query slab against the full (gathered) point set — the
point-cloud analog of blockwise attention. Not needed at 24k points (fits one chip);
this is the documented scale-out path for larger scans.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_square_distance(src: jnp.ndarray, dst: jnp.ndarray, mesh: Mesh,
                            axis: str = "model") -> jnp.ndarray:
    """Pairwise squared distances with the query axis sharded over the mesh.

    src ``[M, C]`` is split into per-device slabs; dst ``[N, C]`` is replicated.
    Output ``[M, N]`` comes back sharded over the query axis. Demonstrates the
    shard_map point-axis pattern used when one chip cannot hold the O(M·N) buffer.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops.distance import square_distance

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(None, None)),
             out_specs=P(axis, None))
    def _kernel(src_slab, dst_full):
        return square_distance(src_slab, dst_full)

    return _kernel(src, dst)
