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

from ..ops.pallas.attention_kernel import fold_bn  # eval-BN affine fold

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


# ---------------------------------------------------------------------------
# Full point-sharded encoder stage: TransitionDown + PointTransformerBlock(s)
# and the decoder's TransitionUp — the complete set of layer types one
# encoder/decoder stage of the backbone needs, all with the point axis sharded.
# ---------------------------------------------------------------------------


def extract_block_params(variables, name: str) -> dict:
    """Flatten a trained dense ``PointTransformerBlock``'s variables (params +
    batch_stats under module ``name``) into the replicated eval-param dict the
    sharded block consumes. BNs are folded (eval running stats)."""
    p = variables["params"][name]
    s = variables["batch_stats"][name]

    def bn(sub):
        return fold_bn(p[sub]["scale"], p[sub]["bias"],
                       s[sub]["mean"], s[sub]["var"])

    t, ts = p["transformer"], s["transformer"]

    def tbn(sub):
        return fold_bn(t[sub]["scale"], t[sub]["bias"],
                       ts[sub]["mean"], ts[sub]["var"])

    out = {
        "w_lin1": p["linear1"]["kernel"], "w_lin3": p["linear3"]["kernel"],
        "bn1": bn("bn1"), "bn2": bn("bn2"), "bn3": bn("bn3"),
        "wq": t["linear_q"]["kernel"], "bq": t["linear_q"]["bias"],
        "wk": t["linear_k"]["kernel"], "bk": t["linear_k"]["bias"],
        "wv": t["linear_v"]["kernel"], "bv": t["linear_v"]["bias"],
        "wp0": t["linear_p0"]["kernel"], "bp0": t["linear_p0"]["bias"],
        "wp1": t["linear_p1"]["kernel"], "bp1": t["linear_p1"]["bias"],
        "w0": t["linear_w0"]["kernel"], "c0": t["linear_w0"]["bias"],
        "w1": t["linear_w1"]["kernel"], "c1": t["linear_w1"]["bias"],
        "bn_p": tbn("linear_p_bn"),
        "bn_w0": tbn("linear_w_bn0"), "bn_w1": tbn("linear_w_bn1"),
    }
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), out)


def _affine(x, ab):
    a, b = ab
    return x * a + b


def _attention_local(q, p_r, x_g, w: dict, share_planes: int):
    """The vector-attention math AFTER the neighborhood gather — pure local
    work, shared verbatim between shards (backbone.py:PointTransformerLayer
    XLA path; reference blocks.py:14-44). q [M, mid]; p_r/x_g [M, K, 3/C]."""
    m, k, _ = p_r.shape
    mid = q.shape[-1]
    out = w["wv"].shape[-1]
    cs = out // share_planes

    p_flat = p_r.reshape(m * k, 3)
    x_flat = x_g.reshape(m * k, -1)
    k_g = x_flat @ w["wk"] + w["bk"]
    v_g = x_flat @ w["wv"] + w["bv"]
    pe = _affine(p_flat @ w["wp0"] + w["bp0"], w["bn_p"])
    pe = jnp.maximum(pe, 0.0) @ w["wp1"] + w["bp1"]

    logits = k_g - jnp.repeat(q, k, axis=0) + pe
    logits = jnp.maximum(_affine(logits, w["bn_w0"]), 0.0) @ w["w0"] + w["c0"]
    logits = jnp.maximum(_affine(logits, w["bn_w1"]), 0.0) @ w["w1"] + w["c1"]

    w3 = logits.reshape(m, k, cs)
    w3 = w3 - jnp.max(w3, axis=1, keepdims=True)
    ex = jnp.exp(w3)
    w3 = ex / jnp.sum(ex, axis=1, keepdims=True)

    w_full = jnp.tile(w3.reshape(m * k, cs), (1, share_planes))
    prod = (v_g + pe) * w_full
    reduce_m = jnp.tile(jnp.eye(out, dtype=prod.dtype), (k, 1))
    return jnp.matmul(prod.reshape(m, k * out), reduce_m,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def sharded_point_transformer_block(p, x, knn_idx, params: dict, mesh: Mesh,
                                    axis: str = "model",
                                    share_planes: int = 8):
    """Eval-mode residual PointTransformerBlock with the POINT axis sharded
    (backbone.py:PointTransformerBlock; reference blocks.py:114-135).

    The only cross-device exchange is the neighborhood gather: k/v source rows
    ride the ppermute ring (``_ring_gather_body`` of cat(p, x)); q, the
    positional/weight MLPs, softmax, and the aggregation are all local to the
    query shard. This composes with ``sharded_transition_down`` into a full
    point-sharded encoder stage.

    Args:
      p: ``[N, 3]`` sharded over ``axis``; x: ``[N, C]`` sharded likewise.
      knn_idx: ``[N, K]`` GLOBAL neighbor indices, sharded over queries
        (e.g. from ``parallel.ring.ring_knn``).
      params: ``extract_block_params`` dict (replicated).

    Returns ``[N, C]`` sharded — numerically the dense block's eval output.
    """
    from jax.experimental.shard_map import shard_map

    n = p.shape[0]
    n_dev = mesh.shape[axis]
    shard_n = n // n_dev

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P()),
             out_specs=P(axis, None), check_rep=False)
    def _kernel(p_shard, x_shard, idx_shard, w):
        me = jax.lax.axis_index(axis)
        identity = x_shard
        h = x_shard @ w["w_lin1"]
        h = jnp.maximum(_affine(h, w["bn1"]), 0.0)

        q = h @ w["wq"] + w["bq"]
        ph = jnp.concatenate([p_shard, h], axis=-1)
        grouped = _ring_gather_body(ph, idx_shard, me, shard_n, n_dev, axis)
        p_r = grouped[..., :3] - p_shard[:, None, :]
        agg = _attention_local(q, p_r, grouped[..., 3:], w, share_planes)

        h = jnp.maximum(_affine(agg, w["bn2"]), 0.0)
        h = h @ w["w_lin3"]
        h = _affine(h, w["bn3"])
        return jnp.maximum(h + identity, 0.0)

    return _kernel(p.astype(jnp.float32), x.astype(jnp.float32),
                   knn_idx.astype(jnp.int32), params)


def sharded_transition_up(p1, x1, p2, x2, params: dict, mesh: Mesh,
                          axis: str = "model"):
    """Eval-mode decoder TransitionUp with BOTH resolutions point-sharded
    (backbone.py:TransitionUp non-head branch; reference blocks.py:82-111):
    lateral Dense+BN+ReLU on each side (local), then 3-NN inverse-distance
    interpolation of the coarse features onto the fine points — the 3-NN runs
    on the ring (``_ring_knn_body``) and the weighted gather rides the same
    ring (``_ring_gather_body``), so no device ever holds the full cloud.

    params: {"w1","b1","bn1","w2","b2","bn2"} with bn* folded eval affines.
    Returns ``[N1, C_out]`` sharded over ``axis``.
    """
    from jax.experimental.shard_map import shard_map

    n1, n2 = p1.shape[0], p2.shape[0]
    n_dev = mesh.shape[axis]
    shard1, shard2 = n1 // n_dev, n2 // n_dev

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P()),
             out_specs=P(axis, None), check_rep=False)
    def _kernel(p1s, x1s, p2s, x2s, w):
        me = jax.lax.axis_index(axis)
        a = x1s @ w["w1"] + w["b1"]
        a = jnp.maximum(_affine(a, w["bn1"]), 0.0)
        b = x2s @ w["w2"] + w["b2"]
        b = jnp.maximum(_affine(b, w["bn2"]), 0.0)

        kidx = _ring_knn_body(p1s, p2s, 3, me, shard2, n_dev, axis)
        neigh_pb = _ring_gather_body(jnp.concatenate([p2s, b], -1), kidx,
                                     me, shard2, n_dev, axis)
        delta = neigh_pb[..., :3] - p1s[:, None, :]
        d2 = jnp.sum(delta * delta, axis=-1)
        dist = jnp.where(d2 > 0, jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
        recip = 1.0 / (dist + 1e-8)                       # pointops.py:170-173
        wgt = recip / jnp.sum(recip, axis=-1, keepdims=True)
        up = jnp.sum(neigh_pb[..., 3:] * wgt[..., None], axis=1)
        return a + up

    return _kernel(p1.astype(jnp.float32), x1.astype(jnp.float32),
                   p2.astype(jnp.float32), x2.astype(jnp.float32),
                   jax.tree_util.tree_map(
                       lambda a: jnp.asarray(a, jnp.float32), params))


def extract_backbone_params(variables, stride, blocks, block_num) -> dict:
    """Flatten a trained dense ``PointTransformerSeg``'s variables into the
    replicated eval-param tree ``sharded_backbone_forward`` consumes — every
    BN folded with its running stats (eval mode). Layout mirrors the dense
    module names (backbone.py:412-513): ``enc{i}_down``, ``enc{i}_block{j}``,
    ``dec{i}_up``, ``dec{i}_block1``, ``cls_head``/``offset_head``."""
    p, s = variables["params"], variables["batch_stats"]
    bn_ct = block_num

    def fold(mp, ms):
        return fold_bn(mp["scale"], mp["bias"], ms["mean"], ms["var"])

    out = {}
    for i in range(bn_ct):
        dn = f"enc{i + 1}_down"
        out[dn] = {"w": p[dn]["linear"]["kernel"],
                   "bn": fold(p[dn]["bn"], s[dn]["bn"])}
        for j in range(1, blocks[i]):
            nm = f"enc{i + 1}_block{j}"
            out[nm] = extract_block_params(variables, nm)
    hd = f"dec{bn_ct}_up"
    out[hd] = {"w1": p[hd]["linear1"]["kernel"], "b1": p[hd]["linear1"]["bias"],
               "bn1": fold(p[hd]["bn1"], s[hd]["bn1"]),
               "w2": p[hd]["linear2"]["kernel"], "b2": p[hd]["linear2"]["bias"]}
    out[f"dec{bn_ct}_block1"] = extract_block_params(
        variables, f"dec{bn_ct}_block1")
    for i in range(bn_ct - 2, -1, -1):
        up = f"dec{i + 1}_up"
        out[up] = {
            "w1": p[up]["linear1"]["kernel"], "b1": p[up]["linear1"]["bias"],
            "bn1": fold(p[up]["bn1"], s[up]["bn1"]),
            "w2": p[up]["linear2"]["kernel"], "b2": p[up]["linear2"]["bias"],
            "bn2": fold(p[up]["bn2"], s[up]["bn2"])}
        out[f"dec{i + 1}_block1"] = extract_block_params(
            variables, f"dec{i + 1}_block1")
    for head in ("cls_head", "offset_head"):
        hp, hs = p[head], s[head]
        out[head] = {"cls": {"w": hp["cls"]["kernel"], "b": hp["cls"]["bias"]}}
        for i in range(bn_ct):
            st = f"stage_{i}"
            out[head][st] = {
                "w": hp[st]["dense"]["kernel"], "b": hp[st]["dense"]["bias"],
                "bn": fold(hp[st]["bn"], hs[st]["bn"])}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), out)


def sharded_backbone_forward(feat: jnp.ndarray, params: dict, mesh: Mesh,
                             axis: str = "model", *,
                             planes=(32, 64, 128, 256, 512),
                             stride=(1, 4, 4, 4, 4),
                             nsample=(36, 24, 24, 24, 24),
                             blocks=(2, 3, 4, 6, 3), block_num: int = 5,
                             share_planes: int = 8) -> dict:
    """The COMPLETE point-sharded eval forward of the cbl point-transformer
    U-Net (backbone.py:PointTransformerSeg; reference
    cbl_point_transformer_module.py:28-216): encoder ladder, bottleneck head,
    decoder with 3-NN interpolation, shared 1-NN upsample indices, and both
    MultiHeads — every tensor stays ``N_stage/D`` per device throughout, with
    ICI traffic limited to FPS argmax scalars, ppermute ring rotations, and
    the bottleneck-mean psum. This closes SURVEY.md §2.8(3): a whole model
    forward (not just one stage) runs point-sharded, so scans larger than one
    chip's HBM are servable.

    Args:
      feat: ``[N, c]`` point features (xyz first 3), N divisible by D and by
        every cumulative stride product. Fully-valid cloud (no mask): the
        sharded path serves single whole scans.
      params: :func:`extract_backbone_params` tree (replicated).

    Returns ``{"sem_1": [N, k], "offset_1": [N, 3], "embed": [N, planes[0]]}``
    — numerically the dense module's eval outputs (parity-tested on the
    8-device mesh, tests/test_misc_parallel.py::TestShardedBackboneForward).
    """
    from .ring import ring_knn

    f32 = jnp.float32
    p = feat[:, :3].astype(f32)
    x = feat.astype(f32)

    def dense_bn_relu(h, w, bn):
        a, b = bn
        return jnp.maximum((h @ w) * a[None, :] + b[None, :], 0.0)

    # ---------------- encoder ----------------
    stages = []  # per stage: p, x, kidx, full_res (p identical to stage 0's)
    full_res = True
    for i in range(block_num):
        dp = params[f"enc{i + 1}_down"]
        if stride[i] == 1:
            x = dense_bn_relu(x, dp["w"], dp["bn"])
        else:
            scale, shift = dp["bn"]
            p, x = sharded_transition_down(
                p, x, p.shape[0] // stride[i], nsample[i], dp["w"], scale,
                shift, mesh, axis)
            full_res = False
        kidx, _ = ring_knn(p, p, nsample[i], mesh, axis)
        for j in range(1, blocks[i]):
            x = sharded_point_transformer_block(
                p, x, kidx, params[f"enc{i + 1}_block{j}"], mesh, axis,
                share_planes)
        stages.append({"p": p, "x": x, "kidx": kidx, "full_res": full_res})

    # ---------------- decoder ----------------
    # bottleneck TransitionUp (is_head, backbone.py:298-306): per-cloud mean
    # (a psum under SPMD) -> Dense+ReLU -> concat -> Dense+BN+ReLU, all local
    # but the mean; then one attention block on the summit point set
    top = stages[block_num - 1]
    hp = params[f"dec{block_num}_up"]
    g = jnp.maximum(jnp.mean(top["x"], axis=0) @ hp["w2"] + hp["b2"], 0.0)
    h = jnp.concatenate(
        [top["x"], jnp.broadcast_to(g[None, :], top["x"].shape[:1] + g.shape)],
        axis=-1)
    a1, b1 = hp["bn1"]
    h = jnp.maximum((h @ hp["w1"] + hp["b1"]) * a1[None, :] + b1[None, :], 0.0)
    x = sharded_point_transformer_block(
        top["p"], h, top["kidx"], params[f"dec{block_num}_block1"], mesh, axis,
        share_planes)
    up_x = [None] * block_num
    up_x[block_num - 1] = x
    for i in range(block_num - 2, -1, -1):
        lo, hi = stages[i], stages[i + 1]
        x = sharded_transition_up(lo["p"], lo["x"], hi["p"], up_x[i + 1],
                                  params[f"dec{i + 1}_up"], mesh, axis)
        x = sharded_point_transformer_block(
            lo["p"], x, lo["kidx"], params[f"dec{i + 1}_block1"], mesh, axis,
            share_planes)
        up_x[i] = x

    # -------- shared 1-NN upsample indices (backbone.py:493-507) --------
    p0 = stages[0]["p"]
    n0 = p0.shape[0]
    up1_idx = [None]
    for i in range(1, block_num):
        if stages[i]["full_res"]:
            up1_idx.append(jnp.arange(n0, dtype=jnp.int32))
        else:
            idx, _ = ring_knn(p0, stages[i]["p"], 1, mesh, axis)
            up1_idx.append(idx[:, 0])

    # ---------------- MultiHeads (backbone.py:335-359) ----------------
    from .sharded_ops import ring_gather

    def multi_head(hp):
        collect = []
        for i in range(block_num):
            sp = hp[f"stage_{i}"]
            a, b = sp["bn"]
            lat = jnp.maximum(
                (up_x[i] @ sp["w"] + sp["b"]) * a[None, :] + b[None, :], 0.0)
            if i > 0:  # 1-NN upsample to full res (heads.py:43-51)
                lat = ring_gather(lat, up1_idx[i][:, None], mesh, axis)[:, 0]
            collect.append(lat)
        h = jnp.concatenate(collect, axis=-1)
        return h @ hp["cls"]["w"] + hp["cls"]["b"]

    return {
        "sem_1": multi_head(params["cls_head"]),
        "offset_1": multi_head(params["offset_head"]),
        "embed": up_x[0],
    }


def sharded_encoder_stage(p, x, n_samples: int, k_down: int, k_attn: int,
                          down_params: dict, block_params: list[dict],
                          mesh: Mesh, axis: str = "model",
                          share_planes: int = 8):
    """One COMPLETE point-sharded encoder stage of the backbone
    (backbone.py:383-413: TransitionDown -> per-stage ring kNN -> attention
    blocks), eval mode: every tensor stays sharded ``N/D`` per device
    throughout. Parity vs the dense stage is tested on the 8-device mesh
    (tests/test_misc_parallel.py::TestShardedEncoderStage).

    down_params: {"w","scale","shift"}; block_params: one
    ``extract_block_params`` dict per attention block.
    Returns ``(new_p [M,3], new_x [M,C'])`` sharded over ``axis``.
    """
    from .ring import ring_knn

    new_p, new_x = sharded_transition_down(
        p, x, n_samples, k_down, down_params["w"], down_params["scale"],
        down_params["shift"], mesh, axis)
    # per-stage kNN computed ONCE and shared by every block (backbone.py:401)
    kidx, _ = ring_knn(new_p, new_p, k_attn, mesh, axis)
    for bp in block_params:
        new_x = sharded_point_transformer_block(
            new_p, new_x, kidx, bp, mesh, axis, share_planes)
    return new_p, new_x
