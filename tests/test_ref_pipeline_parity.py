"""WHOLE-PIPELINE output parity: the actual reference tgn ``InferencePipeLine``
(torch CPU + pointops stub + fake o3d/trimesh, tests/ref_pipeline.py) vs this
framework's ``TgnInferencePipeline`` on the same synthetic scan (round-3
verdict stretch item 9 — closes the gap between module-level parity,
tests/test_torch_parity.py, and pipeline-level parity).

Both stacks run with the SAME deterministic structured leaf predictors
injected in place of the trained backbones (ref_pipeline.py: random-init nets
cannot satisfy the reference's happy-path branch preconditions — empty-fg
DBSCAN crash, PCA over <3 instance centers). Everything else is the real
production path on both sides: mesh prep, FPS, DBSCAN/MeanShift instancing,
crop construction, vote aggregation, boundary purity resampling, KMeans,
PCA arch disambiguation, boundary-cluster fusion, final 1-NN transfer, FDI
remap.

Agreement is label-level and high-threshold rather than exact: identical
algorithms in different float stacks (torch f32 vs XLA f32, approx_max_k +
bf16-selection candidate ties on our device paths), so a small fraction of
points at disk/cluster boundaries may flip.

Reference: inference_pipelines/inference_pipeline_tgn.py:24-157.
"""

from __future__ import annotations

import numpy as np
import pytest


class FakeTGNet:
    """Flax-free stand-in with the TGNet stage interface (tgn.py resolves
    ``method=type(module).stage1`` so this drop-in works under the pipeline's
    jits). Same math as ref_pipeline.make_structured_leaf_models."""

    def __init__(self, centers: np.ndarray):
        import jax.numpy as jnp

        self._c = jnp.asarray(centers, jnp.float32)          # [T, 3]

    # flax's Module.apply(variables, *args, method=fn) is emulated with a
    # plain call: the pipeline only ever uses apply(vars, ..., method=...)
    def apply(self, variables, *args, method=None, **kw):
        return method(self, *args, **kw)

    def stage1(self, feats, mask=None):
        import jax.numpy as jnp

        from ref_pipeline import (STRUCT_CONTRACT, STRUCT_PULL_RADIUS,
                                  STRUCT_RADIUS, STRUCT_STRAY_BAND,
                                  STRUCT_STRAY_R)

        xyz = feats[..., :3]                                 # [B, N, 3]
        d = jnp.linalg.norm(xyz[..., None, :] - self._c, axis=-1)
        dmin = jnp.min(d, axis=-1)
        t = jnp.argmin(d, axis=-1)
        fg = dmin < STRUCT_RADIUS
        cls = jnp.where(fg, (t % 9) + 1, 0)
        import jax

        sem = jax.nn.one_hot(cls, 10) * 8.0
        pull = (dmin < STRUCT_PULL_RADIUS)[..., None]
        off = jnp.where(pull, STRUCT_CONTRACT * (self._c[t] - xyz), 0.0)
        # stray band -> DBSCAN noise points (see ref_pipeline.py constants)
        stray = ((dmin > STRUCT_STRAY_BAND[0])
                 & (dmin < STRUCT_STRAY_BAND[1]))[..., None]
        off = jnp.where(
            stray, (xyz - self._c[t]) * (STRUCT_STRAY_R / dmin - 1.0)[..., None],
            off)
        return {"sem_1": sem, "offset_1": off}

    def stage2(self, crop_feat, crop_mask=None):
        import jax
        import jax.numpy as jnp

        from ref_pipeline import (STRUCT_BG_LOGIT, STRUCT_FG_LOGIT,
                                  STRUCT_RADIUS)

        xyz = crop_feat[..., :3]                             # centered crops
        fg = jnp.linalg.norm(xyz, axis=-1) < STRUCT_RADIUS
        sem = (jax.nn.one_hot(fg.astype(jnp.int32), 2)
               * jnp.asarray([STRUCT_BG_LOGIT, STRUCT_FG_LOGIT]))
        return {"sem_1": sem}


@pytest.mark.slow
def test_tgn_pipeline_output_parity(tmp_path):
    import ref_pipeline
    from synthetic import write_synthetic_obj

    from toothgroupnetwork_tpu.data.mesh_io import parse_obj
    from toothgroupnetwork_tpu.data.scan_prep import (dedup_vertices,
                                                      normalize_scan_vertices)
    from toothgroupnetwork_tpu.models import get_task
    from toothgroupnetwork_tpu.pipelines.tgn import TgnInferencePipeline

    obj_path = str(tmp_path / "scan_lower.obj")
    # >24000 post-dedup vertices so neither stack subdivides (the subdivision
    # branch is separately covered by unit tests on both sides)
    write_synthetic_obj(obj_path, n_side=170, seed=3)

    # shared structured-predictor geometry, from the normalized deduped scan
    v, f = parse_obj(obj_path)
    v2, _ = dedup_vertices(v, f)
    vn = normalize_scan_vertices(v2)
    centers = ref_pipeline.pick_tooth_centers(vn, 9)

    fps_ckpt, bdl_ckpt, fps_cfg, bdl_cfg = \
        ref_pipeline.make_reference_checkpoints(tmp_path, seed=0)
    ref_pipe = ref_pipeline.build_reference_tgn_pipeline(
        fps_ckpt, bdl_ckpt, fps_cfg, bdl_cfg)
    ref_pipeline.inject_structured_models(ref_pipe, centers)
    ref_out = ref_pipe(obj_path)

    task = get_task("tgnet_fps")
    cfg = task.default_config()
    fake = FakeTGNet(centers)
    pipe = TgnInferencePipeline(
        None, None, cfg,
        inject_modules=(fake, {"params": {}}, fake, {"params": {}}))
    out = pipe(obj_path)

    assert out["sem"].shape == ref_out["sem"].shape
    sem_agree = (out["sem"] == ref_out["sem"]).mean()
    # instance ids are cluster indices — compare by co-assignment instead of
    # raw id equality (DBSCAN enumeration order can differ): sample pairs and
    # check same-instance relations match
    rng = np.random.default_rng(0)
    n = len(out["ins"])
    a = rng.integers(0, n, 20000)
    b = rng.integers(0, n, 20000)
    ours_same = out["ins"][a] == out["ins"][b]
    ref_same = ref_out["ins"][a] == ref_out["ins"][b]
    ins_agree = (ours_same == ref_same).mean()

    # the structured predictor must actually light the path up: several
    # instances and several sem classes present on both sides
    assert len(np.unique(ref_out["ins"])) >= 5
    assert len(np.unique(out["ins"])) >= 5
    assert len(np.unique(ref_out["sem"])) >= 5

    print(f"sem agreement {sem_agree:.4f}, ins co-assignment {ins_agree:.4f}")
    assert sem_agree > 0.99
    assert ins_agree > 0.99
