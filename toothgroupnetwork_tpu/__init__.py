"""toothgroupnetwork_tpu — a TPU-native (JAX/XLA/Pallas) framework for 3D dental scan
segmentation, a ground-up rebuild of the capabilities of limhoyeon/ToothGroupNetwork
(MICCAI 2022 3DTeethSeg 1st place).

Design principles (see SURVEY.md §7):
  * dense padded ``[B, N, C]`` tensors + validity masks instead of the reference's
    ragged offset-batched tensors (static shapes for XLA),
  * a point-cloud op library (``ops/``) replacing the CUDA ``pointops`` extension
    with jnp reference implementations and fused Pallas TPU kernels,
  * flax.linen model families (pointnet, pointnetpp, dgcnn, pointtransformer,
    tgnet two-stage, tsegnet),
  * jit-compiled train/eval steps, data-parallel sharding over a ``jax.sharding.Mesh``,
  * Orbax full-train-state checkpoints,
  * host-side postprocessing (clustering/instance fusion) behind a clean boundary.
"""

__version__ = "0.1.0"

# NOTE: the persistent XLA compilation cache is enabled lazily and ONLY for
# TPU backends — see utils/compile_cache.py:ensure_compile_cache (called by
# the pipelines and the Trainer). Enabling it at import time poisoned CPU
# runs: XLA:CPU serializes machine-feature-stamped AOT code, and re-loading
# it across processes tripped feature-mismatch loads and hung multi-device
# collectives (the 8-virtual-device dryrun deadlocked in an all-gather
# rendezvous).
