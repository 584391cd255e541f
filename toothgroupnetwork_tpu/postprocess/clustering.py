"""Instance clustering algorithms.

Faithful reimplementation of the reference's ``ops_utils`` clustering path
(reference: ops_utils.py:10-161) — this logic is in the accuracy-critical path of the
tgn pipeline and must match for mIoU parity (SURVEY.md §7.3):

  * ``get_clustering_labels`` (ops_utils.py:86-144): DBSCAN(eps=.03, min_samples=30)
    on foreground offset-moved points → PCA first-eigenvalue test on each cluster's
    CORE points (merged clusters have elongated spectra: first axis > 8× the mean of
    the 4th+ cluster eigenvalues) → re-split flagged clusters with
    MeanShift(bandwidth=.07) → absorb DBSCAN noise points by 10-NN majority vote,
  * ``clustering_points`` (ops_utils.py:10-48): dispatch over dbscan / kmeans /
    mean_shift used by the bdl stage (kmeans with k = #pseudo-instances).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree
from sklearn.cluster import DBSCAN, AgglomerativeClustering, KMeans, MeanShift
from sklearn.decomposition import PCA
from sklearn.mixture import GaussianMixture


def clustering_points(moved_points_list, method: str, num_of_clusters=None):
    """Returns (cluster_centroids, cluster_centroid_labels, point_labels_list) —
    one entry per input cloud (ops_utils.py:10-48 contract; like the reference,
    any unrecognized method name falls through to a GaussianMixture with
    ``num_of_clusters`` components, ops_utils.py:35)."""
    cluster_centroids, cluster_centroid_labels, point_labels_list = [], [], []
    for b, pts in enumerate(moved_points_list):
        if method == "dbscan":
            labels = DBSCAN(eps=0.03, min_samples=60).fit(pts).labels_
        elif method == "aggl":
            k = max(1, int(num_of_clusters[b]))
            labels = AgglomerativeClustering(k).fit(pts).labels_
        elif method == "kmeans":
            k = max(1, int(num_of_clusters[b]))
            # seeded: the reference leaves KMeans unseeded (ops_utils.py:28) but
            # run-to-run instance-label determinism is part of this framework's
            # serving contract (run_many determinism test); the seed is not
            # load-bearing for accuracy
            labels = KMeans(k, init="k-means++", random_state=0).fit(pts).labels_
        elif method == "mean_shift":
            labels = MeanShift(bandwidth=0.05).fit(pts).labels_
        else:
            k = max(1, int(num_of_clusters[b]))
            gm = GaussianMixture(n_components=k, random_state=0).fit(pts)
            labels = gm.predict(pts)
        point_labels_list.append(labels)
        cents, cent_labels = [], []
        for lab in np.unique(labels):
            if lab != -1:
                cents.append(pts[labels == lab].mean(axis=0))
                cent_labels.append(lab)
        cluster_centroids.append(cents)
        cluster_centroid_labels.append(cent_labels)
    return cluster_centroids, cluster_centroid_labels, point_labels_list


def _pca_eigenvalues(points: np.ndarray) -> np.ndarray:
    if points.shape[0] < 3:
        return np.zeros(3)
    return PCA(n_components=3).fit(points).explained_variance_


def get_clustering_labels(moved_points: np.ndarray, labels: np.ndarray):
    """The tgnet instance algorithm (ops_utils.py:86-144).

    Args:
      moved_points: [N, 3] offset-moved coordinates.
      labels: [N] semantic labels; foreground = nonzero.

    Returns instance labels for the FOREGROUND points only (same order as
    ``moved_points[labels != 0]``).
    """
    teeth_cond = labels != 0
    fg = moved_points[teeth_cond, :]
    if fg.shape[0] == 0:
        # zero-foreground scan (e.g. an edentulous jaw or a degenerate
        # checkpoint): no instances. The reference crashes here
        # (ops_utils.py:95 DBSCAN on an empty array) — robustness guard, same
        # family as the <4-cluster PCA-test guard below.
        return np.zeros((0,), dtype=np.int64)

    clustering = DBSCAN(eps=0.03, min_samples=30).fit(fg)
    clustering_labels = clustering.labels_.copy()
    core_mask = np.zeros(len(clustering_labels), dtype=bool)
    core_mask[clustering.core_sample_indices_] = True

    uniq = [l for l in np.unique(clustering.labels_) if l != -1]
    core_points = [fg[core_mask & (clustering.labels_ == l)] for l in uniq]

    eg = np.array([_pca_eigenvalues(cp) for cp in core_points]) \
        if core_points else np.zeros((0, 3))

    # merged-cluster detection: first-axis variance of the top clusters vs the mean
    # of the 4th+ (ops_utils.py:117-126). Needs >= 4 clusters for the tail mean.
    resplit = []
    if eg.shape[0] >= 4:
        first_axis = eg[:, 0]
        order = np.argsort(-first_axis)
        sorted_first = first_axis[order]
        tail_mean = sorted_first[3:].mean()
        for i in range(3):
            if tail_mean > 0 and sorted_first[i] / tail_mean > 8:
                resplit.append(order[i])

    for idx, cluster_id in enumerate(resplit):
        pts = fg[clustering.labels_ == uniq[cluster_id]]
        # bin_seeding: seed from a bandwidth-binned grid instead of every point
        # (documented deviation from ops_utils.py:130 — plain MeanShift is
        # O(n^2 * iters) and takes minutes on a few-thousand-point merged
        # cluster; binned seeding finds the same modes to within bin width)
        ms = MeanShift(bandwidth=0.07, bin_seeding=True).fit(pts)
        clustering_labels[clustering_labels == uniq[cluster_id]] = \
            ms.labels_ + 100 * (idx + 1)

    # absorb noise points: 10-NN majority among labeled points (ops_utils.py:134-142)
    noise = clustering_labels == -1
    if noise.any() and (~noise).any():
        tree = cKDTree(fg[~noise])
        k = min(10, int((~noise).sum()))
        _, nn = tree.query(fg[noise], k=k, workers=-1)
        nn = np.atleast_2d(nn)
        if nn.ndim == 1:
            nn = nn[:, None]
        labeled = clustering_labels[~noise]
        votes = labeled[nn]
        mod = []
        for row in votes:
            u, c = np.unique(row, return_counts=True)
            mod.append(u[np.argmax(c)])
        clustering_labels[noise] = np.array(mod)
    elif noise.all():
        clustering_labels[:] = 0

    return clustering_labels


def first_label_ratio(labels_arr: np.ndarray) -> np.ndarray:
    """Fraction of each row sharing the FIRST column's label.

    Equivalent to the reference's ``count_unique_by_row(...)[:, 0] / k``
    (gen_utils.py:26-32 used at inference_pipeline_tgn.py:283-287): since column 0 of
    a kNN result is the nearest neighbor, this is the 1-NN label's share among the
    k-NN — the boundary purity score.
    """
    return (labels_arr == labels_arr[:, :1]).mean(axis=1)
