"""Profiling utilities (SURVEY.md §5 tracing/profiling — the reference has none).

Two tools:
  * :func:`chained_time` — trustworthy op/model timing through the axon TPU
    tunnel. Independent repeated calls through the tunnel can report "0.1 ms" for
    ops that move hundreds of MB because ``block_until_ready`` does not reliably
    wait for small ops; the fix is DEPENDENT CHAINING inside one compiled loop:
    each iteration's input depends on the previous output, and the whole n-iter
    loop is one device program timed by a single host readback.
  * :func:`trace` — a ``jax.profiler`` trace context manager writing a
    TensorBoard-loadable trace directory for kernel-level inspection.

Also :func:`cost_bytes` — ``compiled.cost_analysis()['bytes accessed']``, the
reliable way to find HBM-traffic monsters (tunnel timings of single ops are not).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def _dep_scalar(out) -> jnp.ndarray:
    """A cheap scalar depending on EVERY ELEMENT of every output leaf.

    Must be a full reduction, not a single element: depending on ``leaf[0]``
    alone lets XLA dead-code-eliminate everything not feeding element 0 —
    measured r4: a 24k tgnet stage-1 forward "cost" 6.2 ms chained (the final
    heads sliced to one point) while its true wall cost was ~80-90 ms. The
    reduce itself is one VPU pass over the outputs (negligible next to the
    work being measured)."""
    s = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            if leaf.dtype == jnp.bool_:
                s = s + jnp.sum(leaf).astype(jnp.float32)
            else:
                s = s + jnp.sum(leaf.astype(jnp.float32))
    return s


def chained_time(fn, *args, iters: int = 10, warmup: bool = True) -> float:
    """Seconds per call of ``fn(*args)``, measured with dependent chaining.

    The first argument must be a float array; each iteration feeds
    ``arg0 * (1 + 0·dep)`` so XLA cannot parallelize or elide iterations, and the
    n-iteration loop compiles to ONE device program (tunnel-safe). Returns
    wall-seconds per iteration of the second (cached) loop execution.
    """
    arg0, rest = args[0], args[1:]

    @jax.jit
    def loop(a0):
        def body(_, carry):
            out = fn(carry, *rest)
            dep = _dep_scalar(out) * jnp.float32(1e-30)
            return carry * (jnp.float32(1.0) + dep).astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, a0)

    if warmup:
        r = loop(arg0)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0]
    t0 = time.perf_counter()
    r = loop(arg0)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0]
    return (time.perf_counter() - t0) / iters


def cost_bytes(fn, *args) -> float:
    """'bytes accessed' from XLA's cost model for ``jit(fn)(*args)``."""
    compiled = jax.jit(fn).lower(*args).compile()
    analyses = compiled.cost_analysis()
    ca = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    return float(ca.get("bytes accessed", float("nan")))


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context: ``with trace('/tmp/jax-trace'): run()``.

    Produces a TensorBoard ``plugins/profile`` directory; diffable across rounds.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ScansPerSec:
    """Simple throughput counter: ``c = ScansPerSec(); ...; c.add(n); c.rate()``."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.n = 0

    def add(self, n: int = 1):
        self.n += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else float("inf")
