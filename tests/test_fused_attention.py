"""Fused Pallas vector-attention kernel vs the XLA graph (interpret on CPU).

The kernel (ops/pallas/attention_kernel.py) is the eval-mode specialization of
PointTransformerLayer with the BatchNorms folded; it must agree with the
unfused path to float tolerance with arbitrary (non-init) batch statistics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toothgroupnetwork_tpu.ops import knn_points
from toothgroupnetwork_tpu.models.point_transformer.backbone import (
    PointTransformerLayer)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup(rng, b=2, n=200, kk=12, cc=32):
    lay = PointTransformerLayer(planes=cc)
    pp = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.2, jnp.float32)
    xx = jnp.asarray(rng.standard_normal((b, n, cc)) * 0.2, jnp.float32)
    kidx, _ = knn_points(pp, pp, kk, include_self=True)
    vs = lay.init(jax.random.PRNGKey(0), pp, xx, kidx, None, train=True)
    # randomize batch_stats so the BN folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.standard_normal(a.shape) * 0.1 + 0.5,
                                  a.dtype), vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": stats}
    return lay, vs, pp, xx, kidx


class TestFusedAttention:
    def test_matches_xla_path(self, rng, monkeypatch):
        lay, vs, pp, xx, kidx = _setup(rng)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "xla")
        ref = lay.apply(vs, pp, xx, kidx, None, False)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "fused")
        got = lay.apply(vs, pp, xx, kidx, None, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_packed_matches_xla_path(self, rng, monkeypatch):
        """The lane-packed from-x kernel (k/v projected in-kernel via
        kron(I_K, W) block-diagonal matmuls — the r4 serving path for batched
        crop layers) must agree with the XLA graph; in f32 interpret mode the
        zero-padded kron dots are numerically benign (atol only)."""
        lay, vs, pp, xx, kidx = _setup(rng, b=3, n=160, kk=12, cc=32)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "xla")
        ref = lay.apply(vs, pp, xx, kidx, None, False)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "packed")
        got = lay.apply(vs, pp, xx, kidx, None, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_packed_x_entry_direct(self, rng):
        """fused_vector_attention_packed_x == fused_vector_attention_packed
        (pre-projected) on the same folded params: the in-kernel kron
        projection must reproduce the XLA-side Dense exactly."""
        from toothgroupnetwork_tpu.ops.pallas.attention_kernel import (
            fold_attention_params, fused_vector_attention_packed,
            fused_vector_attention_packed_x)

        lay, vs, pp, xx, kidx = _setup(rng, b=2, n=96, kk=8, cc=32)
        params = fold_attention_params({
            "params": vs["params"], "batch_stats": vs["batch_stats"]})
        b, n, kk = kidx.shape
        c = xx.shape[-1]
        from toothgroupnetwork_tpu.ops import index_points
        x_g = index_points(xx, kidx).reshape(b * n * kk, c)
        p_r = (index_points(pp, kidx) - pp[..., None, :]).reshape(-1, 3)
        q = jnp.einsum("bnc,cd->bnd", xx, vs["params"]["linear_q"]["kernel"]
                       ) + vs["params"]["linear_q"]["bias"]
        q = q.reshape(b * n, c)
        k_g = x_g @ params["wk"] + params["bk"]
        v_g = x_g @ params["wv"] + params["bv"]
        ref = fused_vector_attention_packed(q, k_g, v_g, p_r, params, k=kk)
        got = fused_vector_attention_packed_x(q, x_g, p_r, params, k=kk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_param_tree_identical(self, rng, monkeypatch):
        """The fused branch's probe-based param creation must produce the
        exact same variable tree (names + shapes) as the XLA branch."""
        lay, vs, pp, xx, kidx = _setup(rng, b=1, n=64, kk=8)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "fused")
        vs_fused = lay.init(jax.random.PRNGKey(0), pp[:1, :64], xx[:1, :64],
                            kidx[:1, :64], None, train=False)
        ref_shapes = jax.tree_util.tree_map(jnp.shape, vs["params"])
        got_shapes = jax.tree_util.tree_map(jnp.shape, vs_fused["params"])
        assert ref_shapes == got_shapes

    def test_train_path_unaffected(self, rng, monkeypatch):
        """train=True must never route through the kernel (BN statistics)."""
        lay, vs, pp, xx, kidx = _setup(rng, b=1, n=96, kk=8)
        monkeypatch.setenv("TGN_TPU_ATTENTION", "fused")
        out, muts = lay.apply(vs, pp[:1, :96], xx[:1, :96], kidx[:1, :96],
                              None, True, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out)).all()
        assert "batch_stats" in muts
