"""Persistent XLA compilation cache — TPU-only, enabled lazily.

A fresh serving/CI process otherwise pays minutes re-compiling the flagship
programs through the tunneled TPU; with the cache, warm-start drops to the
deserialization cost. The cache is deliberately NOT enabled for CPU backends:
XLA:CPU serializes machine-feature-stamped AOT code, and re-loading it in a
different process tripped `cpu_aot_loader` feature-mismatch errors and hung
multi-device collectives (the 8-virtual-device `dryrun_multichip` deadlocked
in an all-gather rendezvous when it picked up cache entries written by the
test suite).

Call :func:`ensure_compile_cache` AFTER the backend is decided (pipeline
constructors and the Trainer do). Opt out with ``TGN_TPU_COMPILE_CACHE=off``;
point it elsewhere with ``TGN_TPU_COMPILE_CACHE_DIR`` or manage it yourself
via ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os

_TPU_BACKENDS = ("tpu", "axon")


def ensure_compile_cache() -> bool:
    """Enable the persistent compilation cache if running on a TPU backend.

    Idempotent; never raises. Returns True if the cache is (already) active.
    """
    if os.environ.get("TGN_TPU_COMPILE_CACHE", "on") == "off":
        return False
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return True  # user-managed
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return True  # already set (by us or the user)
        # default_backend() initializes the backend; by the time a pipeline
        # or Trainer calls this, that was about to happen anyway.
        if jax.default_backend() not in _TPU_BACKENDS:
            return False
        path = os.environ.get(
            "TGN_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "tgn_tpu_xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # keep jax's default 1s min-compile-time gate (tiny programs churn)
        return True
    except Exception:  # never let cache setup break the caller
        return False
