"""A/B the MXU one-hot gather kernel vs XLA's row gather at the backbone's
hot shapes (chained, DCE-proof). Run ALONE on the TPU.

Usage: python tools/profile_gather_mxu.py [--out /tmp/r5_gather.txt]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_gather.txt")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    out = open(args.out, "a", buffering=1)

    def log(m):
        print(m, flush=True)
        out.write(m + "\n")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.ops import index_points
    from toothgroupnetwork_tpu.ops.pallas.gather_kernel import \
        onehot_gather_packed
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    log(f"=== profile_gather_mxu {time.strftime('%H:%M:%S')} "
        f"backend={jax.default_backend()} ===")
    rng = np.random.default_rng(0)

    # (tag, B, N, C, M, K) — crop attention, 24k attention, TransitionDown,
    # 1-NN upsample
    shapes = [
        ("crop attn    ", 16, 3072, 32, 3072, 36),
        ("crop attn c16", 16, 3072, 16, 3072, 36),
        ("24k attn     ", 1, 24000, 32, 24000, 36),
        ("crop TD      ", 16, 3072, 32, 768, 24),
        ("24k TD       ", 1, 24000, 32, 6000, 24),
    ]
    for tag, b, n, c, m, k in shapes:
        x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32),
                        jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, (b, m, k)).astype(np.int32))

        def xla_fn(xx, idx=idx, b=b, m=m, k=k, c=c):
            return index_points(xx, idx).reshape(b, m, k * c)

        def mxu_fn(xx, idx=idx):
            return onehot_gather_packed(xx, idx)

        # correctness on-device first
        t0 = time.perf_counter()
        got = np.asarray(mxu_fn(x), np.float32)
        want = np.asarray(xla_fn(x), np.float32)
        ok = np.array_equal(got, want)
        log(f"  {tag} B{b} N{n} C{c} M{m} K{k}: exact={ok} "
            f"(compile+run {time.perf_counter() - t0:.1f}s)")
        if not ok:
            log(f"    max|diff|={np.abs(got - want).max()}")
            continue
        dt_x = chained_time(xla_fn, x, iters=args.iters)
        dt_m = chained_time(mxu_fn, x, iters=args.iters)
        log(f"    XLA gather {dt_x * 1e3:8.2f} ms   MXU onehot "
            f"{dt_m * 1e3:8.2f} ms   ({dt_x / dt_m:.2f}x)")

    log(f"=== done {time.strftime('%H:%M:%S')} ===")


if __name__ == "__main__":
    main()
