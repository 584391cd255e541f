"""Honest A/B of the super-row cell-attention path vs the default, at the
B=1 full-res stages it was built for.

r3 measured cells LOSING (bdl stage1 42.6 -> 75.8 ms) — but r4 found the
baseline numbers were DCE-corrupted (utils/profiling.py:_dep_scalar), and the
honest gather bench shows the per-block plain row gather costs 8-14 ms while
the dedup'd cell-candidate gather is near-free (27k super-rows). Re-decide
with DCE-proof chained timing on SORTED clouds.

Usage: python tools/profile_cells.py [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.models.point_transformer.backbone import \
        PointTransformerSeg
    from toothgroupnetwork_tpu.ops.cells import spatial_sort_perm
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # synthetic surface-ish cloud, SORTED (the cell path's requirement)
    import tempfile

    from synthetic import write_synthetic_obj

    from toothgroupnetwork_tpu.data.mesh_io import (compute_vertex_normals,
                                                    parse_obj)
    from toothgroupnetwork_tpu.data.scan_prep import normalize_scan_vertices

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "s_lower.obj")
    write_synthetic_obj(p, n_side=170, seed=0)
    v, f = parse_obj(p)
    v = normalize_scan_vertices(v).astype(np.float32)
    nrm = compute_vertex_normals(v, f)
    feats = np.concatenate([v, nrm], 1).astype(np.float32)[:24000]
    feats = feats[spatial_sort_perm(feats[:, :3])]
    fd = jnp.asarray(feats[None])

    for tag, kw in (
        ("bdl-arch stage1 (5 blocks, stride 1,1)",
         dict(planes=(16, 32), stride=(1, 1), nsample=(36, 24),
              blocks=(2, 3), block_num=2)),
        ("fps-arch stage1 (full 5-stage)",
         dict(planes=(32, 64, 128, 256, 512), stride=(1, 4, 4, 4, 4),
              nsample=(36, 24, 24, 24, 24), blocks=(2, 3, 4, 6, 3),
              block_num=5)),
    ):
        for cells in (False, True):
            mod = PointTransformerSeg(k=10, c=6, dtype=jnp.bfloat16,
                                      cell_attention=cells, **kw)
            vs = jax.jit(mod.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), fd, None, train=False)

            def run(x):
                return mod.apply(vs, x, None, False)["sem_1"]

            dt = chained_time(jax.jit(run), fd, iters=args.iters)
            print(f"{tag:<40s} cells={cells}: {dt * 1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
