"""Numerical parity against the ACTUAL reference torch model.

Builds the reference's pointnet (pure-torch, no CUDA deps), converts its weights
with utils.torch_import, and compares eval-mode forward outputs on the same input.
This validates end-to-end: the masked-BN == torch-BN claim, the Conv1d(k=1) → Dense
layout transform, STN semantics, and the whole model graph.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


def _build_reference_pointnet():
    """Reference get_model (models/modules/pointnet.py:9-35), reconstructed from
    its pure-torch dependency to avoid the repo's CUDA imports."""
    from external_libs.pointnet2_utils.pointnet_utils import PointNetEncoder

    class RefPointNet(torch.nn.Module):
        def __init__(self, k=17, scale=2):
            super().__init__()
            self.k = k
            self.feat = PointNetEncoder(global_feat=False,
                                        feature_transform=True, channel=6,
                                        scale=scale)
            self.conv1 = torch.nn.Conv1d(1088 * scale, 512 * scale, 1)
            self.conv2 = torch.nn.Conv1d(512 * scale, 256 * scale, 1)
            self.conv3 = torch.nn.Conv1d(256 * scale, 128 * scale, 1)
            self.conv4 = torch.nn.Conv1d(128 * scale, k, 1)
            self.bn1 = torch.nn.BatchNorm1d(512 * scale)
            self.bn2 = torch.nn.BatchNorm1d(256 * scale)
            self.bn3 = torch.nn.BatchNorm1d(128 * scale)

        def forward(self, x):
            import torch.nn.functional as F

            b, _, n = x.shape
            x, trans, trans_feat = self.feat(x)
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = F.relu(self.bn3(self.conv3(x)))
            x = self.conv4(x)  # raw logits (we compare pre-log_softmax)
            return x, trans_feat

    return RefPointNet(scale=1)


class TestPointNetTorchParity:
    def test_eval_forward_matches(self, rng):
        import jax
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.models.pointnet import PointNetSeg
        from toothgroupnetwork_tpu.utils.torch_import import convert_pointnet

        ref = _build_reference_pointnet()
        # randomize running stats so eval-mode BN actually tests the conversion
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)

        ref.eval()
        x = rng.standard_normal((1, 6, 256)).astype(np.float32)
        with torch.no_grad():
            want, want_tf = ref(torch.tensor(x))
        want = want.permute(0, 2, 1).numpy()  # [1, N, 17]

        variables = convert_pointnet(ref.state_dict())
        model = PointNetSeg(num_classes=17, scale=1)
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 1))), None, False)
        got = np.asarray(out["cls_pred"])

        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["trans_feat"]),
                                   want_tf.numpy(), atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Flagship backbone: the ACTUAL reference cbl point-transformer, run on CPU via
# a numpy pointops stub (tests/ref_cbl.py), vs this framework's backbone with
# converted weights. Covers VERDICT r1 item 5.
# ---------------------------------------------------------------------------

_PT_KW = dict(c=6, k=10, planes=(32, 64, 128, 256, 512), stride=(1, 4, 4, 4, 4),
              nsample=(16, 16, 16, 8, 8), blocks=(2, 3, 4, 6, 3), block_num=5)
_N = 2048


def _build_ref_pt(seed=0):
    from ref_cbl import build_reference_model

    torch.manual_seed(seed)
    model = build_reference_model(**_PT_KW)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    return model


def _my_pt_model():
    from toothgroupnetwork_tpu.models.point_transformer import PointTransformerSeg

    kw = dict(_PT_KW)
    kw.pop("c")
    return PointTransformerSeg(c=6, **kw)


@pytest.mark.slow
class TestPointTransformerTorchParity:
    def test_eval_forward_matches(self, rng):
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.utils.torch_import import (
            convert_point_transformer)

        ref = _build_ref_pt()
        ref.eval()
        x = (rng.standard_normal((1, 6, _N)) * 0.3).astype(np.float32)
        with torch.no_grad():
            cls_ref, off_ref, _, emb_ref = ref([torch.tensor(x)])
        want_cls = cls_ref.permute(0, 2, 1).numpy()       # [1, N, 10]
        want_off = off_ref.permute(0, 2, 1).numpy()       # [1, N, 3]

        variables = convert_point_transformer(ref.state_dict(),
                                              block_num=5, blocks=(2, 3, 4, 6, 3))
        model = _my_pt_model()
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 1))), None, False)

        got_cls = np.asarray(out["sem_1"])
        got_off = np.asarray(out["offset_1"])
        np.testing.assert_allclose(got_cls, want_cls, atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(got_off, want_off, atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out["embed"]),
                                   emb_ref.numpy()[None], atol=2e-3, rtol=1e-2)

    def test_bdl_arch_eval_forward_matches(self, rng):
        """stride-(1,1) bdl arch vs the REAL torch reference — exercises the
        stride-1 fast paths (kNN-prefix reuse, identity 1-NN upsample, skipped
        self-interpolation), which must be numerically invisible."""
        import jax.numpy as jnp

        from ref_cbl import build_reference_model
        from toothgroupnetwork_tpu.models.point_transformer import (
            PointTransformerSeg)
        from toothgroupnetwork_tpu.utils.torch_import import (
            convert_point_transformer)

        kw = dict(c=6, k=9, planes=(16, 32), stride=(1, 1), nsample=(24, 16),
                  blocks=(2, 3), block_num=2)
        torch.manual_seed(3)
        ref = build_reference_model(**kw)
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        ref.eval()
        n = 512
        x = (rng.standard_normal((1, 6, n)) * 0.3).astype(np.float32)
        with torch.no_grad():
            cls_ref, off_ref, _, _ = ref([torch.tensor(x)])
        variables = convert_point_transformer(ref.state_dict(), block_num=2,
                                              blocks=(2, 3))
        mkw = dict(kw)
        mkw.pop("c")
        model = PointTransformerSeg(c=6, **mkw)
        out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                          None, False)
        np.testing.assert_allclose(np.asarray(out["sem_1"]),
                                   cls_ref.permute(0, 2, 1).numpy(),
                                   atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out["offset_1"]),
                                   off_ref.permute(0, 2, 1).numpy(),
                                   atol=2e-3, rtol=1e-2)

    def test_train_cbl_losses_match(self, rng):
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.losses.cbl_loss import cbl_loss_per_stage
        from toothgroupnetwork_tpu.utils.torch_import import (
            convert_point_transformer)

        ref = _build_ref_pt(seed=1)
        ref.train()
        x = (rng.standard_normal((1, 6, _N)) * 0.3).astype(np.float32)
        labels = rng.integers(-1, 9, (1, 1, _N)).astype(np.int64)
        out_ref = ref([torch.tensor(x), torch.tensor(labels)])
        want_cbl = out_ref[0].detach().numpy()            # [5] per-stage losses

        variables = convert_point_transformer(ref.state_dict(),
                                              block_num=5, blocks=(2, 3, 4, 6, 3))
        model = _my_pt_model()
        out, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 1))), None, True,
            mutable=["batch_stats"])
        got_cbl = cbl_loss_per_stage(
            out["cbl_stages"], jnp.asarray(labels[:, 0]), 10,
            _PT_KW["stride"])
        got_cbl = np.asarray([float(v) for v in got_cbl])
        np.testing.assert_allclose(got_cbl, want_cbl, atol=5e-3, rtol=2e-2)

    def test_tgnet_h5_layout(self, rng):
        """convert_tgnet accepts the released two-backbone key layout
        (first_ins_cent_model.* / second_ins_cent_model.*, base_model.py:36-48)."""
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.models.tgnet import TGNet
        from toothgroupnetwork_tpu.utils.torch_import import convert_tgnet

        ref = _build_ref_pt(seed=2)
        ref.eval()
        sd = {}
        for pre in ("first_ins_cent_model", "second_ins_cent_model"):
            for k, v in ref.state_dict().items():
                sd[f"{pre}.{k}"] = v

        variables = convert_tgnet(sd, block_num=5, blocks=(2, 3, 4, 6, 3))
        kw = dict(_PT_KW)
        kw.pop("c"), kw.pop("k")
        model = TGNet(crop_size=64, c=6, **kw)

        x = (rng.standard_normal((1, 6, _N)) * 0.3).astype(np.float32)
        with torch.no_grad():
            cls_ref, _, _, _ = ref([torch.tensor(x)])
        want_cls = cls_ref.permute(0, 2, 1).numpy()

        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 1))), None,
            method=TGNet.stage1)
        np.testing.assert_allclose(np.asarray(out["sem_1"]), want_cls,
                                   atol=2e-3, rtol=1e-2)


@pytest.mark.slow
class TestDGCNNTorchParity:
    """Eval-forward parity vs the REAL reference DGCnnModule (pure torch;
    get_graph_feature's hard-coded cuda device is shimmed to cpu)."""

    def _build_ref(self, seed=1):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_dgcnn", "/root/reference/models/modules/dgcnn.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        # cpu shim for the reference's device=torch.device('cuda')
        # (dgcnn.py:24) — same graph-feature math, cpu index arithmetic
        def get_graph_feature_cpu(x, k=20, idx=None, dim9=False):
            batch_size, num_points = x.size(0), x.size(2)
            x = x.view(batch_size, -1, num_points)
            if idx is None:
                idx = mod.knn(x, k=k)
            idx_base = torch.arange(0, batch_size).view(-1, 1, 1) * num_points
            idx = (idx + idx_base).view(-1)
            _, num_dims, _ = x.size()
            x = x.transpose(2, 1).contiguous()
            feature = x.view(batch_size * num_points, -1)[idx, :]
            feature = feature.view(batch_size, num_points, k, num_dims)
            x = x.view(batch_size, num_points, 1, num_dims).repeat(1, 1, k, 1)
            return torch.cat((feature - x, x), dim=3).permute(
                0, 3, 1, 2).contiguous()

        mod.get_graph_feature = get_graph_feature_cpu
        torch.manual_seed(seed)
        model = mod.DGCnnModule(config={})
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        return model

    def test_eval_forward_matches(self, rng):
        import jax
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.models.dgcnn import DGCNNSeg
        from toothgroupnetwork_tpu.utils.torch_import import convert_dgcnn

        ref = self._build_ref()
        ref.eval()
        n = 256
        x = (rng.standard_normal((1, 6, n)) * 0.5).astype(np.float32)
        with torch.no_grad():
            cls_ref = ref([torch.tensor(x)])["cls_pred"]  # dgcnn.py:131-133

        variables = convert_dgcnn(ref.state_dict())
        model = DGCNNSeg()
        out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                          None, False)
        np.testing.assert_allclose(np.asarray(out["cls_pred"]),
                                   cls_ref.permute(0, 2, 1).numpy(),
                                   atol=2e-3, rtol=1e-2)


@pytest.mark.slow
class TestPointNetPPTorchParity:
    """Eval-forward parity vs the REAL reference pointnet_pp get_model, run on
    CPU with a deterministic FPS patch (the CUDA wrapper seeds each cloud's
    FIRST point, sampling_cuda_kernel.cu:39; the repo's numpy fallback seeds
    randomly, so we patch in the CUDA-seeded equivalent)."""

    def _build_ref(self, seed=2):
        import importlib

        import ref_cbl

        ref_cbl.install()  # pointops stub + cpu patches
        # install() registers an empty-namespace external_libs package for the
        # stub; point it back at the real tree so pointnet2_utils imports
        sys.modules["external_libs"].__path__ = [
            "/root/reference/external_libs"]
        pn2u = importlib.import_module(
            "external_libs.pointnet2_utils.pointnet2_utils")

        def fps_cuda_contract(xyz, npoint):
            B, N, _ = xyz.shape
            out = torch.zeros(B, npoint, dtype=torch.long)
            for b in range(B):
                pts = xyz[b].numpy()
                dist = np.full(N, 1e10, np.float32)
                last = 0
                for i in range(npoint):
                    out[b, i] = last
                    d = ((pts - pts[last]) ** 2).sum(-1)
                    dist = np.minimum(dist, d)
                    dist[out[b, :i + 1].numpy()] = 0.0
                    last = int(np.argmax(dist))
            return out

        pn2u.farthest_point_sample = fps_cuda_contract
        ref_mod = importlib.import_module("models.modules.pointnet_pp")
        torch.manual_seed(seed)
        model = ref_mod.get_model()
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
        return model

    def test_eval_forward_matches(self, rng):
        import jax.numpy as jnp

        from toothgroupnetwork_tpu.models.pointnetpp import PointNetPPSeg
        from toothgroupnetwork_tpu.utils.torch_import import convert_pointnetpp

        ref = self._build_ref()
        ref.eval()
        n = 2048  # SA stage sizes are fixed (1024/512/256): need n >= 1024
        x = (rng.standard_normal((1, 6, n)) * 0.4).astype(np.float32)
        with torch.no_grad():
            out_ref = ref([torch.tensor(x)])
        cls_ref = out_ref[6].permute(0, 2, 1).numpy()
        off_ref = out_ref[4].permute(0, 2, 1).numpy()

        variables = convert_pointnetpp(ref.state_dict())
        model = PointNetPPSeg()
        out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                          None, False)
        np.testing.assert_allclose(np.asarray(out["cls_pred"]), cls_ref,
                                   atol=5e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out["offset"]), off_ref,
                                   atol=5e-3, rtol=1e-2)


@pytest.mark.slow
class TestTsgCentroidTorchParity:
    """Eval-forward parity vs the REAL reference tsg_centroid_module (same CPU
    harness as pointnetpp: pointops stub + CUDA-seeded FPS patch)."""

    def test_eval_forward_matches(self, rng):
        import importlib

        import jax.numpy as jnp
        import ref_cbl

        from toothgroupnetwork_tpu.models.tsegnet import TsgCentroidModule
        from toothgroupnetwork_tpu.utils.torch_import import convert_tsg_centroid

        ref_cbl.install()
        sys.modules["external_libs"].__path__ = [
            "/root/reference/external_libs"]
        pn2u = importlib.import_module(
            "external_libs.pointnet2_utils.pointnet2_utils")

        def fps_cuda_contract(xyz, npoint):
            B, N, _ = xyz.shape
            out = torch.zeros(B, npoint, dtype=torch.long)
            for b in range(B):
                pts = xyz[b].numpy()
                dist = np.full(N, 1e10, np.float32)
                last = 0
                for i in range(npoint):
                    out[b, i] = last
                    d = ((pts - pts[last]) ** 2).sum(-1)
                    dist = np.minimum(dist, d)
                    last = int(np.argmax(dist))
            return out

        pn2u.farthest_point_sample = fps_cuda_contract
        ref_mod = importlib.import_module("models.modules.tsg_centroid_module")
        torch.manual_seed(4)
        ref = ref_mod.get_model()
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
        ref.eval()

        n = 2048
        x = (rng.standard_normal((1, 6, n)) * 0.4).astype(np.float32)
        with torch.no_grad():
            (l0_ref, l3_ref, _, l3xyz_ref, off_ref, dist_ref) = ref(
                torch.tensor(x))

        variables = convert_tsg_centroid(ref.state_dict())
        model = TsgCentroidModule()
        out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                          None, False)
        np.testing.assert_allclose(np.asarray(out["offset_result"]),
                                   off_ref.permute(0, 2, 1).numpy(),
                                   atol=5e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out["dist_result"]),
                                   dist_ref.permute(0, 2, 1).numpy(),
                                   atol=5e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out["l0_points"]),
                                   l0_ref.permute(0, 2, 1).numpy(),
                                   atol=5e-3, rtol=1e-2)
