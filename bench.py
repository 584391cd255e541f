"""Benchmark: full-jaw scans/sec/chip on the flagship model at 24k points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star = 10 scans/sec/chip end-to-end on TPU v5e.

Currently measures the jitted model forward (24k points, argmax to labels) over a
batch, steady-state, on the real chip. As the tgnet pipeline lands this will extend to
the full mesh->JSON path.
"""

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from toothgroupnetwork_tpu.models import get_task

    task = get_task("pointnet")
    config = task.default_config()
    module = task.build_module(config)

    batch = 8
    n = 24000
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((batch, n, 6)), jnp.float32)
    mask = jnp.ones((batch, n), bool)
    variables = module.init(jax.random.PRNGKey(0), feat, mask, False)

    @jax.jit
    def forward(feat, mask):
        out = module.apply(variables, feat, mask, False)
        return jnp.argmax(out["cls_pred"], axis=-1)

    # warmup / compile
    forward(feat, mask).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        labels = forward(feat, mask)
    labels.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_sec = batch * n_iters / dt
    print(json.dumps({
        "metric": "pointnet_forward_scans_per_sec_per_chip_24k",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
