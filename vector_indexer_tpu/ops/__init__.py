"""Numeric kernel core (L0): distances, top-k, brute-force oracle.

TPU-native replacement for the reference's SIMD distance layer
(/root/reference/src/kmeans.rs:377-419, /root/reference/src/utils.rs:28-30).
Instead of 8-lane CPU SIMD over one (point, centroid) pair at a time, every
distance here is a tiled matrix product on the MXU via the expansion
``||x||^2 - 2 x C^T + ||c||^2``, batched over full point/query sets.
"""

from .distance import (
    sq_norms,
    pairwise_sq_l2,
    assign_chunked,
    euclidean_distance_squared,
)
from .topk import topk_smallest, merge_topk, brute_force_topk

__all__ = [
    "sq_norms",
    "pairwise_sq_l2",
    "assign_chunked",
    "euclidean_distance_squared",
    "topk_smallest",
    "merge_topk",
    "brute_force_topk",
]
