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
