"""Ring-pass point-axis sharding: the point-cloud analog of ring attention.

SURVEY.md §2.8(3) / §5: when a scan exceeds one chip (the 24k challenge clouds do
NOT — this is the documented scale-out path), shard the POINT axis over a mesh
axis and exchange shards around the ring with ``lax.ppermute`` so every device's
query slab sees every point shard while only ever holding ``N/D`` points — O(N/D)
memory per device instead of O(N), with compute/communication overlap left to XLA.

``ring_knn`` is exact: each step merges the incoming shard's candidates into a
running top-k (global indices reconstructed from the rotating shard id). The
reference has no distributed anything (grep: no NCCL/MPI, SURVEY.md §2.8); its
single-kernel kNN contract is external_libs/pointops/src/knnquery.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_BIG = jnp.float32(1e10)


def ring_knn(query: jnp.ndarray, points: jnp.ndarray, k: int, mesh: Mesh,
             axis: str = "model") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with BOTH the query and point axes sharded over ``axis``.

    Args:
      query: ``[M, C]`` (M divisible by the mesh axis size).
      points: ``[N, C]`` (N divisible likewise).
      k: neighbors (static, ≤ N / axis_size so every shard can fill a candidate set).

    Returns:
      ``(idx, dist)`` ``[M, k]``: GLOBAL point indices ascending by exact
      Euclidean distance (sqrt), matching :func:`~toothgroupnetwork_tpu.ops.knn_points`.
    """
    n_dev = mesh.shape[axis]
    n = points.shape[0]
    shard_n = n // n_dev
    if k > shard_n:
        raise ValueError(f"ring_knn needs k <= N/devices ({k} > {shard_n})")

    from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
             out_specs=(P(axis, None), P(axis, None)))
    def _kernel(q_slab, p_shard):
        me = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def local_topk(p_blk, owner):
            d2 = (jnp.sum(q_slab**2, -1, keepdims=True)
                  - 2.0 * jnp.matmul(q_slab, p_blk.T,
                                     precision=jax.lax.Precision.HIGHEST)
                  + jnp.sum(p_blk**2, -1)[None, :])
            neg, loc = jax.lax.top_k(-d2, k)
            return -neg, loc + owner * shard_n

        def body(step, carry):
            best_d, best_i, p_blk = carry
            owner = (me - step) % n_dev            # who produced this shard
            d_new, i_new = local_topk(p_blk, owner)
            cat_d = jnp.concatenate([best_d, d_new], axis=-1)
            cat_i = jnp.concatenate([best_i, i_new], axis=-1)
            neg, sel = jax.lax.top_k(-cat_d, k)
            best_d = -neg
            best_i = jnp.take_along_axis(cat_i, sel, axis=-1)
            # rotate the point shard around the ring for the next step
            p_blk = jax.lax.ppermute(p_blk, axis, perm)
            return best_d, best_i, p_blk

        m = q_slab.shape[0]
        # init carries are constants → mark them device-varying over the mesh
        # axis so the fori_loop carry type matches the ppermute'd outputs
        init = (jax.lax.pvary(jnp.full((m, k), _BIG), (axis,)),
                jax.lax.pvary(jnp.zeros((m, k), jnp.int32), (axis,)),
                p_shard)
        best_d, best_i, _ = jax.lax.fori_loop(0, n_dev, body, init)

        # exact re-score + ascending re-sort (matches ops/knn.py: returned
        # distances are exact sqrt; merge ties can reorder equal distances)
        neg, order = jax.lax.top_k(-best_d, k)
        best_i = jnp.take_along_axis(best_i, order, axis=-1)
        d2o = jnp.maximum(-neg, 0.0)
        dist = jnp.where(d2o > 0, jnp.sqrt(jnp.where(d2o > 0, d2o, 1.0)), 0.0)
        return best_i, dist

    return _kernel(query.astype(jnp.float32), points.astype(jnp.float32))
