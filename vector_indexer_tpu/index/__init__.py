"""Index core (L3): two-level IVF-Flat over HBM posting lists.

TPU-native re-design of /root/reference/src/ivf_index.rs: the same two-level
structure (k-means centroids -> inverted lists -> super-centroid shards), but
search is a batched, static-shape device program (coarse matmul -> windowed
posting gather -> masked exact re-rank -> fused top-k) instead of a per-query
async file fan-out.
"""

from .ivf import IvfIndex, load_index_from

__all__ = ["IvfIndex", "load_index_from"]
