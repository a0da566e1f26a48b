"""HBM-resident posting-list layout (CSR over a cluster-permuted vector table).

This is the TPU-native inversion of the reference's disk design: instead of
shard files streamed per query (/root/reference/src/shards.rs:188-349), all
posting lists live in device HBM as one permuted (n_pad, d) table plus CSR
offsets, ordered so that every shard's clusters are contiguous. A query is
then: coarse top-n_probe -> static-shape row-window gather -> masked exact
re-rank, with no I/O on the hot path.

Row n (the last, zero-filled row) is the safe gather target for masked slots.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class PostingLayout:
    """Cluster-permuted vector table + CSR offsets, device-resident."""

    vectors: jax.Array  # (n_pad, d) f32; rows >= n are zero padding
    row_norms: jax.Array  # (n_pad,) f32 squared norms (0 for pads)
    offsets: jax.Array  # (k + 1,) int32 CSR row offsets per cluster
    lengths: jax.Array  # (k,) int32 posting-list lengths
    perm: np.ndarray  # (n,) int64: layout row -> internal id (host)
    n: int  # real vector count
    max_list_len: int  # static bound for the gather window

    @property
    def num_clusters(self) -> int:
        return int(self.lengths.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])


def build_layout(
    vectors: np.ndarray,
    labels: np.ndarray,
    num_clusters: int,
    cluster_order: np.ndarray | None = None,
    device_put=True,
) -> PostingLayout:
    """Pack vectors into cluster-contiguous CSR order.

    ``cluster_order`` permutes cluster placement (clusters of the same shard
    are laid out adjacently so multi-chip sharding slices contiguous rows).
    Labels must already be remapped to the dense post-filter id space
    (parity with the empty-list filtering + remap at
    /root/reference/src/ivf_index.rs:122-146).
    """
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    labels = np.asarray(labels, dtype=np.int64)
    n, d = vectors.shape
    if cluster_order is None:
        cluster_order = np.arange(num_clusters, dtype=np.int64)
    cluster_rank = np.empty(num_clusters, dtype=np.int64)
    cluster_rank[cluster_order] = np.arange(num_clusters)

    # Stable sort by (placement rank of cluster) keeps intra-cluster insertion
    # order, matching the reference's list build order (ivf_index.rs:94-101).
    perm = np.argsort(cluster_rank[labels], kind="stable")
    sorted_vecs = vectors[perm]

    counts = np.bincount(labels, minlength=num_clusters)
    counts_in_order = counts[cluster_order]
    offsets = np.zeros(num_clusters + 1, dtype=np.int32)
    np.cumsum(counts_in_order, out=offsets[1:])
    # offsets indexed by *cluster id*: cluster c starts at starts[rank[c]].
    starts_by_rank = offsets[:-1]
    starts = np.empty(num_clusters, dtype=np.int32)
    starts[cluster_order] = starts_by_rank
    lengths = counts.astype(np.int32)
    csr = np.zeros(num_clusters + 1, dtype=np.int32)
    csr[:-1] = starts
    csr[-1] = n  # sentinel; per-cluster ranges use (starts, lengths)

    # Tail padding lets range-DMA kernels read a full static chunked window
    # (<= round_up(max_list_len, 512) rows) from any posting-list start
    # without bounds clamping.
    max_len = int(counts.max()) if num_clusters > 0 and n > 0 else 0
    tail = _round_up(max(max_len, 1), 512) if max_len else 1
    n_pad = _round_up(n + tail + 1, 8)
    padded = np.zeros((n_pad, d), dtype=np.float32)
    padded[:n] = sorted_vecs
    norms = np.zeros(n_pad, dtype=np.float32)
    norms[:n] = (sorted_vecs.astype(np.float64) ** 2).sum(1).astype(np.float32)

    dev = jnp.asarray if device_put else (lambda x: x)
    return PostingLayout(
        vectors=dev(padded),
        row_norms=dev(norms),
        offsets=dev(csr),
        lengths=dev(lengths),
        perm=perm,
        n=n,
        max_list_len=max_len,
    )


def cluster_starts(layout: PostingLayout) -> jax.Array:
    """Per-cluster start rows, indexed by cluster id."""
    return layout.offsets[:-1]
