"""Point-Transformer segmentation backbone (vector self-attention U-Net).

TPU-native rebuild of the reference's cbl_point_transformer
(reference: models/modules/cbl_point_transformer/blocks.py:14-135 and
cbl_point_transformer_module.py:28-235). Dense padded ``[B, N, C]`` tensors with
per-stage static sizes (24000 → 6000 → 1500 → 375 → 93 at stride [1,4,4,4,4]) replace
the reference's ragged offset-batched layout.

Key structural optimization over the reference: the per-stage kNN neighborhood is
computed ONCE per stage and shared by every attention block in the stage and by the
CBL loss (the reference re-runs the CUDA knnquery twice per attention layer,
blocks.py:34-35, and again per CBL stage, heads.py:196).

Faithful quirks preserved:
  * attention weight MLP operates on ``share_planes``-grouped channels
    (blocks.py:26-29, 41-43),
  * position encoding ``p_r`` is added to both the attention logits and the values,
  * TransitionUp at the bottleneck concatenates a per-cloud mean embedding
    (blocks.py:93-105),
  * the ``multi`` heads are per-stage latent MLPs, 1-NN upsampled to full resolution,
    concatenated, and linearly classified (heads.py:13-61).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import MaskedBatchNorm, masked_mean
from ...ops import farthest_point_sample, index_points, knn_interpolate, knn_points


def _attention_mode(train: bool, b: int, n: int, k: int, c: int) -> str:
    """Eval-mode kernel dispatch for the attention layer (per shape).

    Modes (TGN_TPU_ATTENTION env; kernels run in interpret mode off-TPU):
      * ``xla`` — the unfused graph. Always used for training (BatchNorm needs
        global batch statistics) and for most eval shapes: the layer is
        GATHER-bound (~13 of ~19 ms at B1/24k/K36/C32) and XLA fuses the rest
        to ~5 ms, beating both Pallas layouts there.
      * ``packed`` — the lane-packed [TR, K·C] kernel with block-diagonal
        pattern matmuls. r4: the from-x entry
        (fused_vector_attention_packed_x) projects k/v IN-KERNEL from the raw
        gather, so the layer materializes one [BNK, C] HBM tensor instead of
        three. Measured (r4, DCE-proof): B16/3072/K36/C32 layer 26.0 vs 41.5
        XLA (block 28.4 vs 38.6) — the remaining cost is the kNN row gather
        itself (21.4 ms of the 26); at B1/24k the LAYER is a wash (12.0 vs
        12.9) but the BLOCK regresses (15.2 vs 12.9 — f32 kernel output
        forces extra dtype hops in the glue), so ``auto`` keeps XLA at B1.
      * ``fused`` — the naive [TR·K, C] kernel: 16.3 ms/layer (3/4 lane waste,
        3D softmax relayouts); kept as a baseline for kernel iteration.
    """
    if train:
        return "xla"
    mode = os.environ.get("TGN_TPU_ATTENTION", "auto")
    if mode != "auto":
        return mode
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and b > 1 and b * n * k >= 10 ** 6 and k * c <= 1536:
        return "packed"
    return "xla"


class PointTransformerLayer(nn.Module):
    """Vector self-attention over a precomputed kNN neighborhood
    (blocks.py:14-44).

    TPU layout note: all neighborhood MLP/BN work runs on FLATTENED 2D
    ``[B·N·K, C]`` tensors — 4D ``[B, N, K, C]`` shapes with small trailing dims
    tile terribly on TPU (measured ~40x slower per op); only the softmax and the
    final aggregation reduce need the 4D view.
    """

    planes: int
    share_planes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, knn_idx, mask=None, train: bool = True,
                 p_r_flat=None, cell_ctx=None):
        """``p_r_flat``: optional precomputed relative-position gather
        ``[B·N·K, 3]`` — identical for every block of a stage, so the backbone
        hoists it (gathers are the dominant cost on TPU, ~26ms each at 24k).

        ``cell_ctx``: optional ``(cand [G, L], pos [N, K])`` super-row
        candidate context (ops/cells.py, hoisted per stage like ``p_r_flat``):
        when present, the per-neighbor row gather — the layer's dominant TPU
        cost — is replaced by a contiguous candidate-block gather + the
        one-hot-matmul select kernel. Requires a spatially sorted cloud and
        B == 1 (the 24k full-res stages; the batched crop stage keeps the
        packed-kernel path)."""
        mid = self.planes
        out = self.planes
        s = self.share_planes
        cs = out // s
        b, n, kk = knn_idx.shape
        bnk = b * n * kk
        cin = x.shape[-1]
        d_q = nn.Dense(mid, dtype=self.dtype, name="linear_q")
        d_k = nn.Dense(mid, dtype=self.dtype, name="linear_k")
        d_v = nn.Dense(out, dtype=self.dtype, name="linear_v")
        q = d_q(x)

        # Gather the RAW features once and project k/v AFTER the gather (the
        # projections commute with the row gather). The gather is the layer's
        # dominant TPU cost and scales with gathered BYTES (~60-90 GB/s
        # effective, 8-sublane read amplification), so moving C channels
        # instead of the 2C-wide concat(k, v) halves it; projecting the K-fold
        # duplicated rows costs only negligible MXU FLOPs.
        if cell_ctx is not None:
            from ...ops.cells import gather_candidate_blocks
            from ...ops.pallas.cell_select_kernel import cell_select_x

            cand, pos = cell_ctx
            blk_x = gather_candidate_blocks(x[0], cand)
            x_g = cell_select_x(blk_x, pos).reshape(bnk, cin)
        else:
            x_g = index_points(x, knn_idx).reshape(bnk, cin)
        if p_r_flat is None:
            p_r_flat = (index_points(p, knn_idx) - p[..., None, :]
                        ).reshape(bnk, 3)

        flat_mask = None
        if mask is not None:
            flat_mask = jnp.broadcast_to(mask[..., None], (b, n, kk)).reshape(-1)

        # submodules shared by the fused and unfused paths (same names/params)
        d_p0 = nn.Dense(3, dtype=self.dtype, name="linear_p0")
        bn_p = MaskedBatchNorm(dtype=self.dtype, name="linear_p_bn")
        d_p1 = nn.Dense(out, dtype=self.dtype, name="linear_p1")
        bn_w0 = MaskedBatchNorm(dtype=self.dtype, name="linear_w_bn0")
        d_w0 = nn.Dense(mid // s, dtype=self.dtype, name="linear_w0")
        bn_w1 = MaskedBatchNorm(dtype=self.dtype, name="linear_w_bn1")
        d_w1 = nn.Dense(cs, dtype=self.dtype, name="linear_w1")

        mode = _attention_mode(train, b, n, kk, mid)
        if mode != "xla":
            # Fused Pallas path (eval only): recover each submodule's affine
            # weights by probing it with zeros/identity (creates the params with
            # the exact same names; avoids private variable access), fold the
            # eval-mode BNs, and run the whole post-gather chain in one kernel.
            from ...ops.pallas.attention_kernel import (
                fused_vector_attention, fused_vector_attention_packed_x)

            f32 = jnp.float32

            def dense_wb(d, din):
                bias = d(jnp.zeros((1, din), self.dtype)).astype(f32)
                ker = d(jnp.eye(din, dtype=self.dtype)).astype(f32) - bias
                return ker, bias[0]

            def bn_ab(bn, din):
                shift = bn(jnp.zeros((1, din), self.dtype), None,
                           False).astype(f32)
                scale = bn(jnp.ones((1, din), self.dtype), None,
                           False).astype(f32) - shift
                return scale[0], shift[0]

            w_p0, b_p0 = dense_wb(d_p0, 3)
            a_p, bshift_p = bn_ab(bn_p, 3)
            w_p1, b_p1 = dense_wb(d_p1, 3)
            a_w0, b_w0 = bn_ab(bn_w0, mid)
            w_w0, c_w0 = dense_wb(d_w0, mid)
            a_w1, b_w1 = bn_ab(bn_w1, cs)
            w_w1, c_w1 = dense_wb(d_w1, cs)
            params = {
                # BN folded into the Dense(3,3): bn(xW+b) = x(W*a) + (b*a+shift)
                "a0": w_p0 * a_p[None, :], "b0": b_p0 * a_p + bshift_p,
                "a1": w_p1, "b1": b_p1,
                "bn0_scale": a_w0, "bn0_shift": b_w0, "w0": w_w0, "c0": c_w0,
                "bn1_scale": a_w1, "bn1_shift": b_w1, "w1": w_w1, "c1": c_w1,
            }
            w_k, b_k = dense_wb(d_k, cin)
            w_v, b_v = dense_wb(d_v, cin)
            params.update(wk=w_k, bk=b_k, wv=w_v, bv=b_v)
            if mode == "packed":
                # k/v projected IN-KERNEL from the raw gather (r4): the
                # pre-projected variant materialized x_g + k_g + v_g in HBM
                # and the layer is traffic-bound — 32 ms/layer at
                # B16/3072/K36/C32 vs a ~2-4 ms floor. r5: q fed in model
                # dtype + output stored in model dtype (in-kernel compute
                # stays f32) — kills the two f32<->bf16 hop passes around the
                # kernel on the bf16 serving path
                agg = fused_vector_attention_packed_x(
                    q.reshape(b * n, mid), x_g, p_r_flat, params, k=kk,
                    out_dtype=self.dtype)
                return agg.reshape(b, n, out)
            qf = q.reshape(b * n, mid).astype(f32)
            agg = fused_vector_attention(qf, x_g, p_r_flat, params, k=kk)
            return agg.reshape(b, n, out).astype(self.dtype)

        k_g = d_k(x_g)                                        # [BNK, mid]
        v_g = d_v(x_g)                                        # [BNK, out]

        # positional MLP: Linear(3,3) + BN + ReLU + Linear(3, out)  (blocks.py:20)
        pe = d_p0(p_r_flat)
        pe = bn_p(pe, flat_mask, train)
        pe = nn.relu(pe)
        pe = d_p1(pe)                                                         # [BNK, out]

        q_rep = jnp.repeat(q.reshape(b * n, mid), kk, axis=0)
        w = k_g - q_rep + pe
        # weight MLP: BN+ReLU+Linear(mid, mid/s)+BN+ReLU+Linear (blocks.py:22-25)
        w = bn_w0(w, flat_mask, train)
        w = nn.relu(w)
        w = d_w0(w)
        w = bn_w1(w, flat_mask, train)
        w = nn.relu(w)
        w = d_w1(w)                                                           # [BNK, cs]

        # softmax over neighbors: the only 3D hop (small tensor)
        w3 = w.reshape(b * n, kk, cs)
        w3 = w3 - jnp.max(w3, axis=1, keepdims=True)
        ex = jnp.exp(w3)
        w3 = ex / jnp.sum(ex, axis=1, keepdims=True)

        # aggregation in 2D + an MXU matmul-reduce over K:
        # out[nc] = sum_k (v+pe)[n,k,c] * w[n,k,c%cs]
        w_full = jnp.tile(w3.reshape(bnk, cs), (1, s))       # [BNK, C]
        prod = (v_g + pe) * w_full                           # [BNK, C] 2D
        reduce_m = jnp.tile(jnp.eye(out, dtype=prod.dtype), (kk, 1))  # [K*C, C]
        prec = (jax.lax.Precision.HIGHEST if prod.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        agg = jnp.matmul(prod.reshape(b * n, kk * out), reduce_m,
                         preferred_element_type=jnp.float32, precision=prec)
        return agg.reshape(b, n, out).astype(self.dtype)


class PointTransformerBlock(nn.Module):
    """Residual block: linear+BN+ReLU → attention+BN+ReLU → linear+BN, +skip, ReLU
    (blocks.py:114-135)."""

    planes: int
    share_planes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, knn_idx, mask=None, train: bool = True,
                 p_r_flat=None, cell_ctx=None):
        identity = x
        h = nn.Dense(self.planes, use_bias=False, dtype=self.dtype,
                     name="linear1")(x)
        h = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn1")(h, mask, train))
        h = PointTransformerLayer(self.planes, self.share_planes, self.dtype,
                                  name="transformer")(p, h, knn_idx, mask, train,
                                                      p_r_flat, cell_ctx)
        h = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn2")(h, mask, train))
        h = nn.Dense(self.planes, use_bias=False, dtype=self.dtype,
                     name="linear3")(h)
        h = MaskedBatchNorm(dtype=self.dtype, name="bn3")(h, mask, train)
        return nn.relu(h + identity.astype(self.dtype))


class TransitionDown(nn.Module):
    """stride>1: FPS to N/stride, kNN-group with relative xyz, linear+BN+ReLU,
    max-pool; stride==1: plain linear+BN+ReLU (blocks.py:47-79)."""

    out_planes: int
    stride: int = 1
    nsample: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, x, mask=None, train: bool = True):
        if self.stride == 1:
            h = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype,
                         name="linear")(x)
            h = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn")(h, mask, train))
            return p, h, mask
        m = x.shape[1] // self.stride
        fps_idx = farthest_point_sample(p, m, mask)
        new_p = index_points(p, fps_idx)
        new_mask = (index_points(mask[..., None].astype(jnp.float32), fps_idx)
                    [..., 0] > 0) if mask is not None else None
        idx, _ = knn_points(new_p, p, self.nsample, new_mask, mask,
                            need_dist=False, sel_bf16=not train)
        grouped_x = index_points(x, idx)
        grouped_p = index_points(p, idx) - new_p[..., None, :]
        grouped = jnp.concatenate([grouped_p, grouped_x], axis=-1)
        # flatten to 2D for the MLP/BN (TPU layout; see PointTransformerLayer)
        b, mm, kk, cc = grouped.shape
        flat_mask = None
        if new_mask is not None:
            flat_mask = jnp.broadcast_to(new_mask[..., None],
                                         (b, mm, kk)).reshape(-1)
        h = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype,
                     name="linear")(grouped.reshape(b * mm * kk, cc))
        h = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn")(h, flat_mask, train))
        h = h.reshape(b, mm, kk, self.out_planes)
        return new_p, jnp.max(h, axis=2), new_mask


class TransitionUp(nn.Module):
    """Decoder lateral + upsample (blocks.py:82-111). ``is_head=True`` is the
    bottleneck variant: concat per-cloud mean embedding instead of upsampling."""

    in_planes: int
    out_planes: int | None = None  # None => is_head
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p1, x1, mask1=None, p2=None, x2=None, mask2=None,
                 train: bool = True):
        if self.out_planes is None:
            g = masked_mean(x1, mask1, axis=1)               # per-cloud mean
            g = nn.relu(nn.Dense(self.in_planes, dtype=self.dtype,
                                 name="linear2")(g))         # no BN
            g = jnp.broadcast_to(g[:, None, :], x1.shape[:2] + (self.in_planes,))
            h = jnp.concatenate([x1.astype(self.dtype), g], axis=-1)
            h = nn.Dense(self.in_planes, dtype=self.dtype, name="linear1")(h)
            h = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn1")(h, mask1, train))
            return h
        a = nn.Dense(self.out_planes, dtype=self.dtype, name="linear1")(x1)
        a = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn1")(a, mask1, train))
        b = nn.Dense(self.out_planes, dtype=self.dtype, name="linear2")(x2)
        b = nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn2")(b, mask2, train))
        if p1 is p2:
            # stride-1 lateral: source and target point sets are identical, so
            # 3-NN inverse-distance interpolation degenerates to the identity
            # (self at distance 0 gets weight 1/(0+1e-8), ~1.0 after
            # normalization on dedup'd clouds) — skip the N x N pass
            up = b
        else:
            up = knn_interpolate(p1, p2, b, 3, mask1, mask2)  # 3-NN inv-dist
        return (a + up).astype(self.dtype)


class StageMLP(nn.Module):
    """MultiHead per-stage latent MLP: Linear(fdim, base_fdim)+BN+ReLU
    (blocks.py MLP class, 'latent' branch)."""

    base_fdim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        h = nn.Dense(self.base_fdim, dtype=self.dtype, name="dense")(x)
        return nn.relu(MaskedBatchNorm(dtype=self.dtype, name="bn")(h, mask, train))


class MultiHead(nn.Module):
    """Per-stage latent MLPs → 1-NN upsample to full res → concat → Linear(k)
    (heads.py:13-61, combine='concat'). Returns (logits, per-stage latents)."""

    k: int
    base_fdim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stages, up1_idx, train: bool = True):
        collect, latents = [], []
        mask0 = stages[0]["mask"]
        for i, st in enumerate(stages):
            lat = StageMLP(self.base_fdim, self.dtype, name=f"stage_{i}")(
                st["x"], st["mask"], train)
            latents.append(lat)
            if i == 0:
                collect.append(lat)
            else:
                # 1-NN upsample: pure gather of each full-res point's nearest
                # stage-i point (heads.py:43-51, interpolation k=1)
                collect.append(index_points(lat, up1_idx[i]))
        h = jnp.concatenate(collect, axis=-1)
        return nn.Dense(self.k, dtype=jnp.float32, name="cls")(
            h.astype(jnp.float32)), latents


class PointTransformerSeg(nn.Module):
    """The full U-Net (cbl_point_transformer_module.py:28-216).

    Config contract mirrors get_model (cbl_point_transformer_module.py:220-235):
    planes [32,64,128,256,512], stride [1,4,4,4,4], nsample [36,24,24,24,24],
    blocks [2,3,4,6,3], block_num ∈ {2,3,5}, k classes.

    Returns a dict:
      ``sem_1``   [B, N, k] logits (the reference's cls_results pre-permute),
      ``offset_1`` [B, N, 3],
      ``embed``   [B, N, planes[0]] full-res decoder features (the reference's x1),
      ``cbl_stages`` per-up-stage dicts {p, latent, mask, knn_idx} where latent is
        the OFFSET head's per-stage latent — matching the reference's store-back
        order at train batch 1, where ContrastHead reads the latents last written by
        offset_head (cbl_point_transformer_module.py:190-193 + heads.py:58-59).
    """

    k: int
    c: int = 6
    planes: Sequence[int] = (32, 64, 128, 256, 512)
    stride: Sequence[int] = (1, 4, 4, 4, 4)
    nsample: Sequence[int] = (36, 24, 24, 24, 24)
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    block_num: int = 5
    share_planes: int = 8
    base_fdim: int = 32
    # computation dtype for the backbone body (bfloat16 halves the HBM traffic
    # that dominates this model; params/stats/geometry/logits stay float32)
    dtype: jnp.dtype = jnp.float32
    # super-row candidate gathers (ops/cells.py) for the eval-mode full-res
    # stride-1 stages. OPT-IN: requires the caller to feed a SPATIALLY SORTED
    # cloud (ops/cells.py:spatial_sort_perm — the tgn pipeline sorts after
    # FPS); an unsorted cloud silently degrades neighbor coverage.
    cell_attention: bool = False
    cell_slots: int = 32
    # the caller guarantees ``mask`` is CONSTANT within each batch cloud
    # (whole-cloud validity, e.g. the 16 fixed crop slots of TGNet.stage2):
    # the stage-0 self-kNN may then take the windowed inference path even
    # with a mask — live clouds are fully valid (window exactness unchanged)
    # and dead clouds produce garbage neighborhoods that are masked
    # downstream anyway.
    mask_per_cloud: bool = False

    def _cell_ctx(self, p, knn_idx, train: bool):
        """Per-stage super-row candidate context (or None when ineligible):
        eval-mode, B == 1, N divisible by 8 — i.e. the full-res stride-1
        stages of the 24k path, where the per-neighbor gather dominates."""
        b, n, _ = knn_idx.shape
        if (not self.cell_attention or train or b != 1 or n % 8
                or os.environ.get("TGN_TPU_CELLS", "on") == "off"):
            return None
        from ...ops.cells import build_cell_candidates, pos_with_self_fallback

        cand, pos, _ = build_cell_candidates(knn_idx[0], self.cell_slots)
        pos = pos_with_self_fallback(pos, self.cell_slots * 8)
        return cand, pos

    @nn.compact
    def __call__(self, feat, mask=None, train: bool = True):
        bn = self.block_num
        p = feat[..., :3].astype(jnp.float32)  # geometry stays f32 (kNN/FPS)
        x = feat.astype(self.dtype)

        # ---------------- encoder ----------------
        stages = []  # per stage: p, x, mask, knn_idx, p_r_flat, cell_ctx
        sorted_chain = True  # points still in the caller's (sorted) order?
        for i in range(bn):
            p, x, mask = TransitionDown(
                self.planes[i], self.stride[i], self.nsample[i], self.dtype,
                name=f"enc{i + 1}_down")(p, x, mask, train)
            if self.stride[i] != 1:
                sorted_chain = False  # FPS subset: selection order, not sorted
            if (i > 0 and self.stride[i] == 1
                    and self.nsample[i] <= self.nsample[i - 1]):
                # stride-1 stage on the SAME point set with a no-larger k:
                # exact kNN results are ascending, so the k-prefix of the
                # previous stage's neighborhood IS this stage's kNN — saves a
                # full N x N pass (the bdl model is stride (1,1): its stage-2
                # k=24 query over 24k points is stage-1's k=36 sliced)
                knn_idx = stages[i - 1]["knn_idx"][..., :self.nsample[i]]
                p_r_flat = (stages[i - 1]["p_r_flat"]
                            .reshape(x.shape[0], x.shape[1],
                                     self.nsample[i - 1], 3)
                            [:, :, :self.nsample[i], :].reshape(-1, 3))
                cell_ctx = (self._cell_ctx(p, knn_idx, train)
                            if sorted_chain else None)
            else:
                from ...ops.knn import knn_self

                # windowed at inference on large unmasked clouds (r4: the
                # [N, N] selection is 18 ms at 24k / 13.8 ms at 16x3072)
                knn_idx, _ = knn_self(p, self.nsample[i], mask, train=train,
                                      mask_per_cloud=self.mask_per_cloud)
                cell_ctx = (self._cell_ctx(p, knn_idx, train)
                            if sorted_chain else None)
                # relative-position gather hoisted: shared by every block in
                # the stage (encoder + decoder) — gathers dominate TPU cost
                if cell_ctx is not None:
                    from ...ops.cells import gather_candidate_blocks
                    from ...ops.pallas.cell_select_kernel import cell_select_p

                    blk_p = gather_candidate_blocks(p[0], cell_ctx[0])
                    p_r_flat = cell_select_p(blk_p, cell_ctx[1], p[0]
                                             ).reshape(-1, 3).astype(self.dtype)
                else:
                    p_r_flat = ((index_points(p, knn_idx) - p[..., None, :])
                                .reshape(-1, 3).astype(self.dtype))
            for j in range(1, self.blocks[i]):
                x = PointTransformerBlock(
                    self.planes[i], self.share_planes, self.dtype,
                    name=f"enc{i + 1}_block{j}")(p, x, knn_idx, mask, train,
                                                 p_r_flat, cell_ctx)
            stages.append({"p": p, "x": x, "mask": mask, "knn_idx": knn_idx,
                           "p_r_flat": p_r_flat, "cell_ctx": cell_ctx})

        # ---------------- decoder ----------------
        # topmost: bottleneck TransitionUp (is_head) + 1 block
        top = stages[bn - 1]
        x = TransitionUp(self.planes[bn - 1], None, self.dtype,
                         name=f"dec{bn}_up")(
            top["p"], top["x"], top["mask"], train=train)
        x = PointTransformerBlock(
            self.planes[bn - 1], self.share_planes, self.dtype,
            name=f"dec{bn}_block1")(top["p"], x, top["knn_idx"], top["mask"],
                                    train, top["p_r_flat"], top["cell_ctx"])
        up_x = [None] * bn
        up_x[bn - 1] = x
        for i in range(bn - 2, -1, -1):
            lo, hi = stages[i], stages[i + 1]
            x = TransitionUp(self.planes[i + 1], self.planes[i], self.dtype,
                             name=f"dec{i + 1}_up")(
                lo["p"], lo["x"], lo["mask"],
                hi["p"], up_x[i + 1], hi["mask"], train=train)
            x = PointTransformerBlock(
                self.planes[i], self.share_planes, self.dtype,
                name=f"dec{i + 1}_block1")(lo["p"], x, lo["knn_idx"], lo["mask"],
                                           train, lo["p_r_flat"], lo["cell_ctx"])
            up_x[i] = x

        up_stages = [{"p": stages[i]["p"], "x": up_x[i], "mask": stages[i]["mask"],
                      "knn_idx": stages[i]["knn_idx"]} for i in range(bn)]

        # 1-NN upsample indices, shared by all heads
        p0, m0 = up_stages[0]["p"], up_stages[0]["mask"]
        up1_idx = [None]
        for i in range(1, bn):
            if up_stages[i]["p"] is p0:
                # all strides up to stage i are 1: the stage's points ARE the
                # full-res points, so the 1-NN map is the identity (on
                # dedup'd clouds the nearest point at distance 0 is itself)
                bsz, npts = p0.shape[:2]
                up1_idx.append(jnp.broadcast_to(
                    jnp.arange(npts, dtype=jnp.int32)[None, :], (bsz, npts)))
            else:
                idx, _ = knn_points(p0, up_stages[i]["p"], 1, m0,
                                    up_stages[i]["mask"], need_dist=False,
                                    sel_bf16=not train)
                up1_idx.append(idx[..., 0])  # [B, N] nearest stage-i point

        cls_logits, _ = MultiHead(self.k, self.base_fdim, self.dtype,
                                  name="cls_head")(up_stages, up1_idx, train)
        offset, offset_latents = MultiHead(3, self.base_fdim, self.dtype,
                                           name="offset_head")(
            up_stages, up1_idx, train)

        cbl_stages = [
            {"p": st["p"], "latent": lat.astype(jnp.float32), "mask": st["mask"],
             "knn_idx": st["knn_idx"]}
            for st, lat in zip(up_stages, offset_latents)
        ]
        return {
            "sem_1": cls_logits,
            "cls_pred": cls_logits,
            "offset_1": offset,
            "embed": up_x[0],
            "cbl_stages": cbl_stages,
        }
