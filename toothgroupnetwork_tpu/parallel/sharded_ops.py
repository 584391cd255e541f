"""Point-axis-sharded core ops: FPS and neighbor gather over a device mesh.

Completes the SURVEY.md §2.8(3) ring-pass story (ring kNN lives in
``parallel.ring``): with the POINT axis sharded over a mesh axis, each device
holds ``N/D`` points and the three ops that define the point-transformer
encoder ladder — FPS, kNN, neighborhood gather — run without any device ever
materializing the full cloud. This is the scale-out path for scans larger than
one chip's HBM; the 24k challenge clouds do not need it (they run single-chip),
so these are exact drop-in analogs, parity-tested against the dense ops on a
virtual 8-device mesh (tests/test_misc_parallel.py).

Design notes (tpu-first):
  * FPS is inherently sequential over samples; the per-iteration work
    (min-distance update) is elementwise over the sharded axis, and the global
    argmax reduces per-shard (max, argmax) pairs with ``lax.all_gather`` over
    the mesh axis — O(D) scalars per step over ICI, not points.
  * the winner's coordinates are fetched with a masked one-hot reduction +
    ``psum`` (the owning shard contributes, others add zero).
  * neighbor gather rotates the feature shard around the ring with
    ``lax.ppermute`` (the reference's CUDA grouping kernel assumes one
    global memory, grouping_cuda_kernel.cu:5-25); each step serves the
    neighbor indices that fall in the resident shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = jnp.float32(-3e38)


def sharded_fps(xyz: jnp.ndarray, n_samples: int, mesh: Mesh,
                axis: str = "model",
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact farthest point sampling with the point axis sharded over ``axis``.

    Args:
      xyz: ``[N, 3]`` (N divisible by the mesh axis size).
      n_samples: static sample count.
      mask: optional ``[N]`` validity (valid points first, as everywhere).

    Returns int32 ``[n_samples]`` GLOBAL indices — identical to
    ``ops.farthest_point_sample`` on the gathered cloud (same seed, same
    argmax tie-breaking toward the lower global index).
    """
    from jax.experimental.shard_map import shard_map

    n = xyz.shape[0]
    n_dev = mesh.shape[axis]
    shard_n = n // n_dev
    if mask is None:
        mask = jnp.ones((n,), bool)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis)),
             out_specs=P(), check_rep=False)
    def _kernel(x_shard, valid_shard):
        me = jax.lax.axis_index(axis)
        gidx = me * shard_n + jnp.arange(shard_n, dtype=jnp.int32)
        valid = valid_shard.astype(bool)

        def global_best(dist):
            """(value, global index) of the global max, ties -> lower index."""
            lbest = jnp.max(dist)
            larg = jnp.min(jnp.where(dist == lbest, gidx, n)).astype(jnp.int32)
            vals = jax.lax.all_gather(lbest, axis)          # [D]
            args = jax.lax.all_gather(larg, axis)           # [D]
            gbest = jnp.max(vals)
            return gbest, jnp.min(jnp.where(vals == gbest, args, n)).astype(
                jnp.int32)

        def coords_of(g):
            onehot = (gidx == g).astype(jnp.float32)[:, None]
            return jax.lax.psum(jnp.sum(x_shard * onehot, axis=0), axis)  # [3]

        # seed: first valid global point (argmax(valid) in the dense op) —
        # global_best's tie rule (lower index wins) picks it from the 0/1 mask
        _, start = global_best(jnp.where(valid, 1.0, 0.0))
        start_xyz = coords_of(start)

        neg_inf = _NEG
        dist0 = jnp.where(valid, jnp.float32(3e38), neg_inf)

        def body(i, carry):
            dist, idxs, last_xyz = carry
            d = jnp.sum((x_shard - last_xyz[None, :]) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(valid, d, neg_inf))
            _, nxt = global_best(dist)
            idxs = idxs.at[i].set(nxt)
            return dist, idxs, coords_of(nxt)

        idxs0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
        _, idxs, _ = jax.lax.fori_loop(1, n_samples, body,
                                       (dist0, idxs0, start_xyz))
        return idxs

    return _kernel(xyz.astype(jnp.float32), mask)


def ring_gather(x: jnp.ndarray, idx: jnp.ndarray, mesh: Mesh,
                axis: str = "model") -> jnp.ndarray:
    """Neighborhood gather with BOTH the source rows and the index rows sharded.

    Args:
      x: ``[N, C]`` source features, point axis sharded.
      idx: ``[M, K]`` GLOBAL indices into the N axis, M sharded likewise.

    Returns ``[M, K, C]`` (sharded over M) == ``index_points(x_full, idx_full)``.
    Each of the D ring steps serves the indices resident in the rotating shard;
    peak per-device memory stays O((N + M·K)/D · C).
    """
    from jax.experimental.shard_map import shard_map

    n, c = x.shape
    n_dev = mesh.shape[axis]
    shard_n = n // n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
             out_specs=P(axis, None, None))
    def _kernel(x_shard, idx_shard):
        me = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(d, carry):
            out, xs = carry
            owner = (me - d) % n_dev        # home shard of the resident xs
            local = idx_shard // shard_n == owner
            li = jnp.clip(idx_shard - owner * shard_n, 0, shard_n - 1)
            vals = jnp.take(xs, li.reshape(-1), axis=0).reshape(
                idx_shard.shape + (c,))
            out = jnp.where(local[..., None], vals, out)
            xs = jax.lax.ppermute(xs, axis, perm)
            return out, xs

        out0 = jnp.zeros(idx_shard.shape + (c,), x_shard.dtype)
        # the initial zeros are axis-invariant but the loop fills them with
        # device-varying values — mark them varying up front (shard_map vma)
        out0 = jax.lax.pvary(out0, (axis,))
        out, _ = jax.lax.fori_loop(0, n_dev, step, (out0, x_shard))
        return out

    return _kernel(x, idx)
