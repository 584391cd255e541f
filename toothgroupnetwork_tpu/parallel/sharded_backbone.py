"""Point-sharded model-path ops: the encoder's TransitionDown under sharding.

Wires the sharded primitives (FPS with all-gathered global argmax, ring kNN,
ppermute ring gather — see ``parallel.sharded_ops`` / ``parallel.ring``) into
an actual backbone component: the eval-mode ``TransitionDown`` of the
point-transformer encoder (models/point_transformer/backbone.py:152-187;
reference blocks.py:47-79) with the POINT axis sharded over a mesh axis. Every
device holds ``N/D`` points end to end — FPS selection, the kNN of the
``N/stride`` sampled centers, the ``[M, K, 3+C]`` neighborhood gather, and the
linear+BN+ReLU+maxpool all run on shards, with ICI traffic limited to the
FPS argmax scalars and the D-step ring rotations.

This is the growth path for scans larger than one chip's HBM (SURVEY.md §5
"long-context" analog); the 24k challenge clouds run single-chip. Parity with
the dense module is tested on the virtual 8-device mesh
(tests/test_misc_parallel.py::TestShardedTransitionDown).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_BIG = 3e38


def _fps_body(x_shard, valid, me, shard_n, n, n_samples, axis):
    """Sharded-FPS loop body (see sharded_ops.sharded_fps): returns REPLICATED
    global indices [n_samples]."""
    gidx = me * shard_n + jnp.arange(shard_n, dtype=jnp.int32)

    def global_best(dist):
        lbest = jnp.max(dist)
        larg = jnp.min(jnp.where(dist == lbest, gidx, n)).astype(jnp.int32)
        vals = jax.lax.all_gather(lbest, axis)
        args = jax.lax.all_gather(larg, axis)
        gbest = jnp.max(vals)
        return gbest, jnp.min(jnp.where(vals == gbest, args, n)).astype(
            jnp.int32)

    def coords_of(g):
        onehot = (gidx == g).astype(jnp.float32)[:, None]
        return jax.lax.psum(jnp.sum(x_shard * onehot, axis=0), axis)

    _, start = global_best(jnp.where(valid, 1.0, 0.0))

    def body(i, carry):
        dist, idxs, last_xyz = carry
        d = jnp.sum((x_shard - last_xyz[None, :]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d, jnp.float32(-_BIG)))
        _, nxt = global_best(dist)
        return dist, idxs.at[i].set(nxt), coords_of(nxt)

    dist0 = jnp.where(valid, jnp.float32(_BIG), jnp.float32(-_BIG))
    idxs0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
    _, idxs, _ = jax.lax.fori_loop(1, n_samples, body,
                                   (dist0, idxs0, coords_of(start)))
    return idxs


def _ring_gather_body(x_shard, idx_shard, me, shard_n, n_dev, axis):
    """Ring-gather loop body (see sharded_ops.ring_gather): [Ms, K] global
    indices -> [Ms, K, C] values, rotating the source shard D times."""
    c = x_shard.shape[-1]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(d, carry):
        out, xs = carry
        owner = (me - d) % n_dev
        local = idx_shard // shard_n == owner
        li = jnp.clip(idx_shard - owner * shard_n, 0, shard_n - 1)
        vals = jnp.take(xs, li.reshape(-1), axis=0).reshape(
            idx_shard.shape + (c,))
        out = jnp.where(local[..., None], vals, out)
        return out, jax.lax.ppermute(xs, axis, perm)

    out0 = jax.lax.pvary(jnp.zeros(idx_shard.shape + (c,), x_shard.dtype),
                         (axis,))
    out, _ = jax.lax.fori_loop(0, n_dev, step, (out0, x_shard))
    return out


def _ring_knn_body(q_slab, p_shard, k, me, shard_n, n_dev, axis):
    """Ring-kNN loop body (see ring.ring_knn): [Ms, 3] queries vs the rotating
    point shard -> exact global top-k indices [Ms, k] (ascending distance)."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    m = q_slab.shape[0]

    def local_topk(p_blk, owner):
        d2 = (jnp.sum(q_slab ** 2, -1, keepdims=True)
              - 2.0 * jnp.matmul(q_slab, p_blk.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + jnp.sum(p_blk ** 2, -1)[None, :])
        neg, loc = jax.lax.top_k(-d2, k)
        return -neg, loc + owner * shard_n

    def body(step, carry):
        best_d, best_i, p_blk = carry
        owner = (me - step) % n_dev
        d_new, i_new = local_topk(p_blk, owner)
        cat_d = jnp.concatenate([best_d, d_new], axis=-1)
        cat_i = jnp.concatenate([best_i, i_new], axis=-1)
        neg, sel = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=-1),
                jax.lax.ppermute(p_blk, axis, perm))

    init = (jax.lax.pvary(jnp.full((m, k), jnp.float32(_BIG)), (axis,)),
            jax.lax.pvary(jnp.zeros((m, k), jnp.int32), (axis,)),
            p_shard)
    _, best_i, _ = jax.lax.fori_loop(0, n_dev, body, init)
    return best_i


def sharded_transition_down(p: jnp.ndarray, x: jnp.ndarray, n_samples: int,
                            k: int, lin_kernel: jnp.ndarray,
                            bn_scale: jnp.ndarray, bn_shift: jnp.ndarray,
                            mesh: Mesh, axis: str = "model"):
    """Eval-mode strided TransitionDown with the point axis sharded.

    Args:
      p: ``[N, 3]`` coordinates, sharded over ``axis``.
      x: ``[N, C]`` features, sharded likewise.
      n_samples: FPS target count (``N/stride``; divisible by the axis size).
      k: neighborhood size (``<= N/D`` so every ring step can fill a top-k).
      lin_kernel: ``[3+C, C']`` the Dense(bias=False) kernel.
      bn_scale / bn_shift: folded eval-mode BN affine ``[C']``
        (ops/pallas/attention_kernel.py:fold_bn).

    Returns ``(new_p [n_samples, 3], new_x [n_samples, C'])`` sharded over
    ``axis`` — numerically the dense module's eval output.
    """
    from jax.experimental.shard_map import shard_map

    n = p.shape[0]
    n_dev = mesh.shape[axis]
    shard_n = n // n_dev
    shard_m = n_samples // n_dev

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(None, None), P(None),
                       P(None)),
             out_specs=(P(axis, None), P(axis, None)), check_rep=False)
    def _kernel(p_shard, x_shard, w, scale, shift):
        me = jax.lax.axis_index(axis)
        valid = jnp.ones((shard_n,), bool)

        fps_idx = _fps_body(p_shard, valid, me, shard_n, n, n_samples, axis)
        idx_me = jax.lax.dynamic_slice(fps_idx, (me * shard_m,), (shard_m,))

        new_p = _ring_gather_body(p_shard, idx_me[:, None], me, shard_n,
                                  n_dev, axis)[:, 0, :]          # [Ms, 3]
        kidx = _ring_knn_body(new_p, p_shard, k, me, shard_n, n_dev, axis)

        px = jnp.concatenate([p_shard, x_shard], axis=-1)
        grouped = _ring_gather_body(px, kidx, me, shard_n, n_dev, axis)
        rel = grouped[..., :3] - new_p[:, None, :]
        feats = jnp.concatenate([rel, grouped[..., 3:]], axis=-1)
        h = jnp.dot(feats.reshape(-1, feats.shape[-1]), w,
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h * scale[None, :] + shift[None, :], 0.0)
        h = h.reshape(shard_m, k, -1)
        return new_p, jnp.max(h, axis=1)

    return _kernel(p.astype(jnp.float32), x.astype(jnp.float32),
                   lin_kernel.astype(jnp.float32),
                   bn_scale.astype(jnp.float32), bn_shift.astype(jnp.float32))
