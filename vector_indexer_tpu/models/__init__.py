"""Clustering models (L1): the training engines behind the index.

TPU-native re-implementation of the reference's k-means engine
(/root/reference/src/kmeans.rs). Thread-pool point-parallelism becomes MXU
matmul batching; the sequential per-point mini-batch update becomes a
segment-reduced vectorized update with identical per-cluster learning-rate
semantics (eta = 1/count).
"""

from .kmeans import (
    KMeansResult,
    kmeans_plus_plus_init,
    run_kmeans_balanced,
    run_kmeans_lloyd,
    run_kmeans_lloyd_sampled,
    run_kmeans_mini_batch,
    assign_points,
    assign_points_hierarchical,
    compute_inertia,
)

__all__ = [
    "KMeansResult",
    "kmeans_plus_plus_init",
    "run_kmeans_balanced",
    "run_kmeans_lloyd",
    "run_kmeans_lloyd_sampled",
    "run_kmeans_mini_batch",
    "assign_points",
    "assign_points_hierarchical",
    "compute_inertia",
]
