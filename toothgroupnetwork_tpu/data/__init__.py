"""Data layer: mesh IO, offline preprocessing, augmentation, dataset/batching.

Replaces the reference's gen_utils.py mesh IO (open3d/trimesh based — neither exists
here; we implement the .obj parsing + vertex-normal computation directly),
preprocess_data.py, augmentator.py, and generator.py.
"""

from .mesh_io import parse_obj, compute_vertex_normals, load_mesh_arr
from .preprocess import (
    Y_AXIS_MAX,
    Y_AXIS_MIN,
    fdi_to_class,
    class_to_fdi,
    normalize_vertices,
    preprocess_scan,
)
from .augment import Augmentator, Scaling, Rotation, Translation, default_augmenter
from .dataset import DentalScanDataset, collate_batch, BatchLoader

__all__ = [
    "parse_obj",
    "compute_vertex_normals",
    "load_mesh_arr",
    "Y_AXIS_MAX",
    "Y_AXIS_MIN",
    "fdi_to_class",
    "class_to_fdi",
    "normalize_vertices",
    "preprocess_scan",
    "Augmentator",
    "Scaling",
    "Rotation",
    "Translation",
    "default_augmenter",
    "DentalScanDataset",
    "collate_batch",
    "BatchLoader",
]
