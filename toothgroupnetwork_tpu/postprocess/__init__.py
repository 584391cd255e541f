"""Host-side postprocessing: instance clustering, boundary resampling, label fusion.

These stay on CPU by design (sklearn DBSCAN/KMeans/MeanShift/PCA have no XLA
equivalent and run once per scan); the device↔host boundary is exactly two hops per
scan (stage-1 forward, stage-2 forward) instead of the reference's ≥6 (SURVEY.md §3.4).
"""

from .clustering import (
    clustering_points,
    get_clustering_labels,
    first_label_ratio,
)

__all__ = ["clustering_points", "get_clustering_labels", "first_label_ratio"]
