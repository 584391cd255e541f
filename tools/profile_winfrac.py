"""Round-5 window-fraction A/B: chained timings of the two windowed
serving programs (purity, boundary 1-NN) at TGN_TPU_WIN_FRAC in {3, 4, 5}
at the production shapes (104k-pad org cloud, 24k sampled, 20k boundary).

The window fraction trades the dominant [Nq, W] selection traffic against
the slab margin that guarantees window-true results (boundary.py:_win_frac
notes: frac=5 -> +-2 slabs of mass margin, frac=3 -> +-1 slab, both far
above the 40-NN radius ~2.3% of the extent). Exactness at 3 and 5 is pinned
by the parametrized KD-tree contract tests (tests/test_tgn_pipeline.py).

Usage: python tools/profile_winfrac.py [--out /tmp/winfrac.txt] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

OUT = None


def log(msg: str):
    print(msg, flush=True)
    OUT.write(msg + "\n")
    OUT.flush()


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/winfrac.txt")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    OUT = open(args.out, "a", buffering=1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toothgroupnetwork_tpu.pipelines import tgn as tgn_mod
    from toothgroupnetwork_tpu.postprocess import boundary as bmod
    from toothgroupnetwork_tpu.utils.profiling import chained_time

    log(f"=== profile_winfrac start {time.strftime('%H:%M:%S')} "
        f"backend={jax.default_backend()} iters={args.iters} ===")

    rng = np.random.default_rng(0)
    n0, n, num_bdl = 100489, 24000, 20000
    n_pad = -(-n0 // 8192) * 8192
    pad = np.zeros((n_pad, 6), np.float16)
    pad[:n0] = rng.standard_normal((n0, 6)).astype(np.float16) * 0.3
    pad_dev = jnp.asarray(pad)
    sampled = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * .3)
    labels = jnp.asarray(rng.integers(0, 17, n).astype(np.uint8))
    sel = jnp.asarray(rng.permutation(n0)[:n].astype(np.int32))
    n_bd = 18000

    for frac in (5, 4, 3):
        def purity(p, frac=frac):
            return bmod._purity_window_fn(p, sampled, labels, 40, 0.7,
                                          n_valid=n0, win_frac=frac)

        def nn1(p, frac=frac):
            return tgn_mod._bdl_nn1_win_fn(p, sel, n_bd, n0, num_bdl,
                                           win_frac=frac)

        for name, fn in ((f"purity WINDOW frac={frac}", purity),
                         (f"bdl_nn1 WINDOW frac={frac}", nn1)):
            for attempt in (1, 2):
                try:
                    dt = chained_time(fn, pad_dev, iters=args.iters)
                    log(f"  {name:<28s} {dt * 1e3:9.2f} ms")
                    break
                except Exception as e:
                    if attempt == 2:
                        log(f"  {name:<28s} FAILED {type(e).__name__}")
                    else:
                        time.sleep(20)

    log(f"=== profile_winfrac done {time.strftime('%H:%M:%S')} ===")


if __name__ == "__main__":
    main()
