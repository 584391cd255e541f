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
