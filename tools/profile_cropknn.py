"""A/B: flat vs windowed stage-0 self-kNN at the CROP shape [16, 3072] k=36,
inside a representative block forward (r4: bdl:fused_device went 144 -> 178 ms
in BENCH after mask_per_cloud enabled the windowed path for crop towers —
did the windowed kNN itself regress the crop stage?).

Usage: python tools/profile_cropknn.py  (run ALONE on the TPU)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.ops.knn import knn_points, knn_self_windowed
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for (b, n, k) in ((16, 3072, 36), (1, 24000, 36)):
        pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)
                          * 0.3)

        def flat(p):
            return knn_points(p, p, k, include_self=True, need_dist=False,
                              sel_bf16=True)

        def window(p):
            return knn_self_windowed(p, k, sel_bf16=True)

        tf = chained_time(flat, pts, iters=10)
        tw = chained_time(window, pts, iters=10)
        print(f"[B{b} N{n} K{k}] flat {tf * 1e3:7.2f} ms   "
              f"window {tw * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
