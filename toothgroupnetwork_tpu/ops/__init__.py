"""Point-cloud op library — the TPU-native replacement for the reference's CUDA
``pointops`` extension (reference: external_libs/pointops/src/*, 765 LoC CUDA) and the
dense ``pointnet2_utils`` primitives (reference: external_libs/pointnet2_utils/pointnet2_utils.py).

Every op has a pure-jnp implementation (jit/vmap/grad-compatible, runs on CPU and TPU);
the hot ones (FPS, kNN) additionally have Pallas TPU kernels in ``ops.pallas`` selected
via the ``impl=`` argument or the ``TGN_TPU_KERNELS`` env var.

Conventions:
  * point clouds are dense padded ``[B, N, C]`` (or unbatched ``[N, C]``) arrays,
  * validity masks are boolean ``[B, N]`` (True = real point, False = padding),
  * indices are int32; ops never select invalid points (their distances are +inf),
  * distances returned by ``knn`` are Euclidean (sqrt of squared), matching
    reference pointops.py:43.
"""

from .distance import square_distance, pairwise_sqdist
from .gather import index_points, group_points
from .fps import farthest_point_sample, fps
from .knn import knn_points, knn
from .ball_query import ball_query
from .interpolate import three_nn_interpolate, knn_interpolate
from .misc import aggregation, subtraction
from .sampling import sample_and_group, sample_and_group_all

__all__ = [
    "square_distance",
    "pairwise_sqdist",
    "index_points",
    "group_points",
    "farthest_point_sample",
    "fps",
    "knn_points",
    "knn",
    "ball_query",
    "three_nn_interpolate",
    "knn_interpolate",
    "subtraction",
    "aggregation",
    "sample_and_group",
    "sample_and_group_all",
]
