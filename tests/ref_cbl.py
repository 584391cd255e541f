"""Run the ACTUAL reference cbl point-transformer on CPU for parity tests.

The reference backbone depends on the compiled ``pointops_cuda`` extension and
hard-codes a few ``.cuda()`` calls. This module makes it runnable on CPU:

  * installs a pure numpy/torch-CPU implementation of
    ``external_libs.pointops.functions.pointops`` into ``sys.modules`` BEFORE the
    reference imports it (exact semantics of the CUDA kernels: FPS seeded at each
    cloud's first point with running-min distances, exact kNN sorted ascending
    with the query point first, k=1..3 inverse-distance interpolation —
    external_libs/pointops/src/*/**.cu),
  * patches ``torch.cuda.IntTensor`` (blocks.py:68) and ``torch.Tensor.cuda``
    (cbl_point_transformer_module.py:105) to CPU equivalents / no-ops.

Import ``build_reference_model`` AFTER conftest; torch stays CPU-only.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

sys.path.insert(0, "/root/reference")


def _segments(offset):
    """offset = exclusive ends [n1, n1+n2, ...] → [(start, end), ...]."""
    off = [int(o) for o in offset]
    return list(zip([0] + off[:-1], off))


def _np(x):
    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)


def furthestsampling(xyz, offset, new_offset):
    """(n,3), (b), (b) → (m,) int32 GLOBAL indices. Matches
    sampling_cuda_kernel.cu:14-129: seed = first point of the cloud, iterative
    argmax of the running min-distance."""
    p = _np(xyz).astype(np.float32)
    out = []
    for (s, e), (ns, ne) in zip(_segments(offset), _segments(new_offset)):
        m = ne - ns
        pts = p[s:e]
        tmp = np.full(e - s, 1e10, np.float32)
        idxs = np.zeros(m, np.int64)
        last = 0
        for j in range(1, m):
            d = ((pts - pts[last]) ** 2).sum(-1).astype(np.float32)
            tmp = np.minimum(tmp, d)
            last = int(np.argmax(tmp))
            idxs[j] = last
        out.append(idxs + s)
    return torch.tensor(np.concatenate(out), dtype=torch.int32)


def knnquery(nsample, xyz, new_xyz, offset, new_offset):
    """Exact kNN per cloud segment, ascending, GLOBAL indices
    (knnquery_cuda_kernel.cu:65-108; wrapper returns sqrt, pointops.py:43)."""
    if new_xyz is None:
        new_xyz = xyz
    p = _np(xyz).astype(np.float32)
    q = _np(new_xyz).astype(np.float32)
    idx_out, d_out = [], []
    for (s, e), (ns, ne) in zip(_segments(offset), _segments(new_offset)):
        d2 = ((q[ns:ne, None, :] - p[None, s:e, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :nsample]
        dd = np.take_along_axis(d2, order, axis=-1)
        if order.shape[1] < nsample:
            # k > n: the CUDA kernel leaves unfilled heap slots at the
            # segment's FIRST index with dist2=1e10, sorted to the tail
            # (knnquery_cuda_kernel.cu:87-91) — models rely on it at the
            # deepest crop stages (3072 -> 12 points, nsample=24)
            pad = nsample - order.shape[1]
            order = np.pad(order, ((0, 0), (0, pad)))
            order[:, -pad:] = 0
            dd = np.pad(dd, ((0, 0), (0, pad)), constant_values=1e10)
        idx_out.append(order + s)
        d_out.append(np.sqrt(np.maximum(dd, 0.0)))
    return (torch.tensor(np.concatenate(idx_out), dtype=torch.int32),
            torch.tensor(np.concatenate(d_out), dtype=torch.float32))


def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                  use_xyz=True):
    """Verbatim contract of pointops.py:79-100 (plain indexing)."""
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        idx, _ = knnquery(nsample, xyz, new_xyz, offset, new_offset)
    m = new_xyz.shape[0]
    grouped_xyz = xyz[idx.view(-1).long(), :].view(m, nsample, 3)
    grouped_xyz = grouped_xyz - new_xyz.unsqueeze(1)
    grouped_feat = feat[idx.view(-1).long(), :].view(m, nsample, feat.shape[1])
    if use_xyz:
        return torch.cat((grouped_xyz, grouped_feat), -1)
    return grouped_feat


def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
    """pointops.py:164-180: kNN + inverse-distance weights + weighted gather."""
    idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = torch.sum(dist_recip, dim=1, keepdim=True)
    weight = dist_recip / norm
    new_feat = torch.zeros(new_xyz.shape[0], feat.shape[1])
    for i in range(k):
        new_feat += feat[idx[:, i].long(), :] * weight[:, i].unsqueeze(-1)
    return new_feat


def install():
    """Install the stub + CPU patches; returns the reference ``get_model``."""
    stub = types.ModuleType("external_libs.pointops.functions.pointops")
    stub.furthestsampling = furthestsampling
    stub.knnquery = knnquery
    stub.queryandgroup = queryandgroup
    stub.interpolation = interpolation
    import os

    for name in ("external_libs", "external_libs.pointops",
                 "external_libs.pointops.functions"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            # real directory on __path__ so SIBLING submodules (e.g.
            # external_libs.pointnet2_utils, used by ops_utils) still import
            # from disk; the pointops stub itself wins via sys.modules
            pkg.__path__ = [os.path.join("/root/reference",
                                         *name.split("."))]
            sys.modules[name] = pkg
    sys.modules["external_libs.pointops.functions.pointops"] = stub

    # CPU patches for the two hard-coded cuda spots
    torch.cuda.IntTensor = lambda data: torch.tensor(data, dtype=torch.int32)
    torch.Tensor.cuda = lambda self, *a, **k: self

    from models.modules.cbl_point_transformer.cbl_point_transformer_module import (
        get_model)

    return get_model


def build_reference_model(c=6, k=10, planes=(32, 64, 128, 256, 512),
                          stride=(1, 4, 4, 4, 4), nsample=(16, 16, 16, 16, 8),
                          blocks=(2, 3, 4, 6, 3), block_num=5):
    get_model = install()
    model = get_model(c=c, k=k, planes=list(planes), stride=list(stride),
                      nsample=list(nsample), blocks=list(blocks),
                      block_num=block_num)
    return model
