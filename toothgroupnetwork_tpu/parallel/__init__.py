"""Multi-device parallelism utilities.

The reference has no multi-device support of any kind (SURVEY.md §2.8); these are
first-class here: data-parallel mesh construction + sharding helpers used by the
Trainer, and a point-axis (sequence-parallel analog) sharded pairwise-distance
primitive for scans too large for one chip's HBM.
"""

from .mesh import (
    make_data_mesh,
    shard_batch,
    replicate,
    sharded_square_distance,
)
from .ring import ring_knn
from .distributed import maybe_initialize, local_batch_slice
from .sharded_backbone import (
    sharded_transition_down,
    sharded_point_transformer_block,
    sharded_transition_up,
    sharded_encoder_stage,
    extract_block_params,
)
from .sharded_train import (
    make_point_sharded_train_step,
    shard_batch_points,
)

__all__ = ["make_data_mesh", "shard_batch", "replicate",
           "sharded_square_distance", "ring_knn", "maybe_initialize",
           "local_batch_slice", "sharded_transition_down",
           "sharded_point_transformer_block", "sharded_transition_up",
           "sharded_encoder_stage", "extract_block_params",
           "make_point_sharded_train_step", "shard_batch_points"]
