"""Tune the boundary-purity kNN (postprocess/boundary.py:_purity_device_fn).

The 104k x 24k k=40 purity query was ~189 ms chained at round 3 start — the
largest single device phase after the model stages. Sweeps the query-axis
chunk size (the default 2048 gives 51 sequential lax.map steps) and measures
the upload-inclusive wall cost.

Usage: python tools/profile_purity.py  (on the real TPU; run ALONE)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from toothgroupnetwork_tpu.ops import knn_points
from toothgroupnetwork_tpu.ops.gather import index_points
from toothgroupnetwork_tpu.utils.profiling import chained_time


def purity_fn(chunk: int):
    def fn(org_xyz, sampled_xyz, labels):
        idx, _ = knn_points(org_xyz, sampled_xyz, 40, None, None,
                            need_dist=False, chunk=chunk)
        cand = idx[:, :4]
        cand_xyz = index_points(sampled_xyz, cand)
        delta = org_xyz[:, None, :].astype(jnp.float32) - cand_xyz
        d2 = jnp.sum(delta * delta, axis=-1)
        best = jnp.argmin(d2, axis=-1)
        nn1 = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
        nn1_lab = jnp.take(labels, nn1)
        lab = jnp.take(labels, idx.reshape(-1)).reshape(idx.shape)
        ratio = jnp.mean((lab == nn1_lab[:, None]).astype(jnp.float32), axis=1)
        return ratio, nn1_lab
    return fn


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n_org, n_s = 104448, 24000  # 100k scan padded to the 8192 bucket
    org = rng.standard_normal((n_org, 3)).astype(np.float32) * 0.4
    samp = org[rng.permutation(n_org)[:n_s]] + rng.normal(
        0, 0.001, (n_s, 3)).astype(np.float32)
    labels = rng.integers(0, 17, n_s).astype(np.int32)

    org_d = jnp.asarray(org)
    samp_d, lab_d = jnp.asarray(samp), jnp.asarray(labels)

    for chunk in (2048, 4096, 8192, 13056, 26112):
        f = jax.jit(purity_fn(chunk))
        # warmup/compile
        r = jax.block_until_ready(f(org_d, samp_d, lab_d))
        t = chained_time(lambda o: f(o, samp_d, lab_d)[0], org_d, iters=8)
        print(f"chunk={chunk:6d}: {t * 1e3:7.1f} ms chained", flush=True)

    # upload-inclusive wall (the per-scan reality: org cloud uploaded fresh)
    f = jax.jit(purity_fn(8192))
    jax.block_until_ready(f(org_d, samp_d, lab_d))
    for _ in range(3):
        t0 = time.perf_counter()
        ratio, nn1 = jax.device_get(
            f(jnp.asarray(org), jnp.asarray(samp), jnp.asarray(labels)))
        print(f"wall incl upload+fetch: {(time.perf_counter() - t0) * 1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
