"""Model families (flax.linen, channel-last, mask-aware).

Reference parity (SURVEY.md §2.3): pointnet, pointnetpp, dgcnn, pointtransformer,
tgnet (fps + bdl two-stage), tsegnet.
"""

from .registry import ModelTask, get_task, available_models, register_task

# importing a family module registers its task(s)
from . import tasks  # noqa: F401

__all__ = ["ModelTask", "get_task", "available_models", "register_task"]
