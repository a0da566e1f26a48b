"""HBM-resident posting-list layout (CSR over a cluster-permuted vector table).

This is the TPU-native inversion of the reference's disk design: instead of
shard files streamed per query (/root/reference/src/shards.rs:188-349), all
posting lists live in device HBM as one permuted (n_pad, d) table plus CSR
offsets, ordered so that every shard's clusters are contiguous. A query is
then: coarse top-n_probe -> static-shape row-window gather -> masked exact
re-rank, with no I/O on the hot path.

Every posting run starts at a multiple of ``ALIGN`` rows, so row-blocks map
1:1 to clusters and the dense path's probe mask can be built on the
n/ALIGN block grid (ALIGN x cheaper prefix sums) and expanded exactly.
Alignment gap rows and the table tail carry SENTINEL_NORM in ``row_norms``
(their vectors are zero), which pushes their distances beyond any real
candidate; ``perm`` is -1 there.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

ALIGN = 8  # posting-run row alignment (block-mask granularity)
SENTINEL_NORM = np.float32(1e30)  # gap/tail rows: distance ~1e30, never win
SENTINEL_THRESHOLD = 1e29  # distances above this are non-results


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class PostingLayout:
    """Cluster-permuted vector table + CSR offsets, device-resident."""

    vectors: jax.Array  # (n_pad, d) f32; gap/tail rows are zero
    row_norms: jax.Array  # (n_pad,) f32 squared norms; SENTINEL_NORM on pads
    offsets: jax.Array  # (k + 1,) int32: per-cluster start rows (+ row end)
    lengths: jax.Array  # (k,) int32 posting-list lengths
    perm: np.ndarray  # (rows_used,) int64: layout row -> internal id; -1 gaps
    n: int  # real vector count
    max_list_len: int  # static bound for the gather window

    @property
    def num_clusters(self) -> int:
        return int(self.lengths.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])

    @property
    def rows_used(self) -> int:
        return len(self.perm)


def _finalize(
    sorted_vecs: np.ndarray,
    perm_real: np.ndarray,
    starts: np.ndarray,  # aligned, by cluster id
    lengths: np.ndarray,
    num_clusters: int,
    device_put=True,
    n_real: int | None = None,
) -> PostingLayout:
    """Common packing: place each cluster's rows at its aligned start.

    ``n_real`` is the distinct-vector count when entries are spilled
    (multi-assigned) and exceed it; defaults to the entry count."""
    n, d = sorted_vecs.shape if sorted_vecs.ndim == 2 else (0, 1)
    if n_real is not None and n:
        n = min(n_real, n)
    if num_clusters and n:
        rows_used = int((starts + _round_up_arr(lengths, ALIGN)).max())
        max_len = int(lengths.max())
    else:
        rows_used, max_len = 0, 0
    tail = _round_up(max(max_len, 1), 512) if max_len else 1
    n_pad = _round_up(rows_used + tail + 1, ALIGN)

    padded = np.zeros((n_pad, d), dtype=np.float32)
    norms = np.full(n_pad, SENTINEL_NORM, dtype=np.float32)
    perm = np.full(rows_used, -1, dtype=np.int64)

    pos = 0  # cursor into sorted_vecs (clusters concatenated in layout order)
    order = np.argsort(starts, kind="stable")
    for cid in order:
        m = int(lengths[cid])
        if m == 0:
            continue
        s = int(starts[cid])
        block = sorted_vecs[pos : pos + m]
        padded[s : s + m] = block
        norms[s : s + m] = (block.astype(np.float64) ** 2).sum(1).astype(np.float32)
        perm[s : s + m] = perm_real[pos : pos + m]
        pos += m

    csr = np.zeros(num_clusters + 1, dtype=np.int32)
    csr[:-1] = starts
    csr[-1] = rows_used

    dev = jnp.asarray if device_put else (lambda x: x)
    return PostingLayout(
        vectors=dev(padded),
        row_norms=dev(norms),
        offsets=dev(csr),
        lengths=dev(lengths.astype(np.int32)),
        perm=perm,
        n=n,
        max_list_len=max_len,
    )


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def build_layout(
    vectors,
    labels: np.ndarray,
    num_clusters: int,
    cluster_order: np.ndarray | None = None,
    device_put=True,
    point_ids: np.ndarray | None = None,
) -> PostingLayout:
    """Pack vectors into cluster-contiguous, ALIGN-aligned CSR order.

    ``cluster_order`` permutes cluster placement (clusters of the same shard
    are laid out adjacently so multi-chip sharding slices contiguous rows).
    Labels must already be remapped to the dense post-filter id space
    (parity with the empty-list filtering + remap at
    /root/reference/src/ivf_index.rs:122-146).

    ``point_ids`` maps each label entry to its source vector row (= internal
    id); pass it when entries outnumber vectors, i.e. spilled
    (multi-assigned) builds where one vector lands in several posting lists.
    Default: entry i is vector i.

    When ``vectors`` is already a device array (the trainer staged it), the
    permuted table is built by a DEVICE gather driven by a small int32 row
    map — the host never packs or re-uploads the (n, d) payload. Measured at
    n=1M, d=128 over this environment's device tunnel: host packing +
    re-upload cost ~178 s of build wall-clock; the row map is 4 bytes/row.
    """
    labels = np.asarray(labels, dtype=np.int64)
    n = vectors.shape[0]
    if point_ids is None:
        point_ids = np.arange(len(labels), dtype=np.int64)
    else:
        point_ids = np.asarray(point_ids, dtype=np.int64)
    if cluster_order is None:
        cluster_order = np.arange(num_clusters, dtype=np.int64)
    cluster_rank = np.empty(num_clusters, dtype=np.int64)
    cluster_rank[cluster_order] = np.arange(num_clusters)

    # Stable sort by (placement rank of cluster) keeps intra-cluster insertion
    # order, matching the reference's list build order (ivf_index.rs:94-101).
    entry_perm = np.argsort(cluster_rank[labels], kind="stable")
    perm_real = point_ids[entry_perm]  # layout placement order -> internal id

    counts = np.bincount(labels, minlength=num_clusters)
    lengths = counts.astype(np.int32)
    # Aligned placement in cluster_order.
    sizes_in_order = _round_up_arr(counts[cluster_order], ALIGN)
    starts_in_order = np.zeros(num_clusters, dtype=np.int64)
    if num_clusters > 1:
        np.cumsum(sizes_in_order[:-1], out=starts_in_order[1:])
    starts = np.empty(num_clusters, dtype=np.int64)
    starts[cluster_order] = starts_in_order

    if isinstance(vectors, jax.Array) and device_put:
        return _finalize_device(
            vectors, perm_real, starts, lengths, num_clusters, n_real=n
        )
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    return _finalize(
        vectors[perm_real], perm_real, starts, lengths, num_clusters,
        device_put, n_real=n,
    )


def _finalize_device(
    vectors_dev: jax.Array,
    perm_real: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    num_clusters: int,
    n_real: int | None = None,
) -> PostingLayout:
    """Device-side packing: layout row r takes vectors_dev[rowmap[r]]
    (rowmap -1 on gap/tail rows -> zero vector + SENTINEL norm). perm_real
    entries are source rows (= internal ids); spilled builds repeat them."""
    n, d = vectors_dev.shape
    if n_real is not None:
        n = min(n, n_real)
    if num_clusters and n:
        rows_used = int((starts + _round_up_arr(lengths, ALIGN)).max())
        max_len = int(lengths.max())
    else:
        rows_used, max_len = 0, 0
    tail = _round_up(max(max_len, 1), 512) if max_len else 1
    n_pad = _round_up(rows_used + tail + 1, ALIGN)

    perm = np.full(rows_used, -1, dtype=np.int64)
    pos = 0
    order = np.argsort(starts, kind="stable")
    for cid in order:
        m = int(lengths[cid])
        if m:
            s = int(starts[cid])
            perm[s : s + m] = perm_real[pos : pos + m]
            pos += m

    rowmap = np.full(n_pad, -1, dtype=np.int64)
    rowmap[:rows_used] = perm
    rm = jnp.asarray(rowmap, jnp.int32)
    real = rm >= 0
    padded = jnp.where(
        real[:, None], vectors_dev[jnp.maximum(rm, 0)], 0.0
    )
    norms = jnp.where(real, jnp.sum(padded * padded, axis=1), SENTINEL_NORM)

    csr = np.zeros(num_clusters + 1, dtype=np.int32)
    csr[:-1] = starts
    csr[-1] = rows_used
    return PostingLayout(
        vectors=padded,
        row_norms=norms,
        offsets=jnp.asarray(csr),
        lengths=jnp.asarray(lengths.astype(np.int32)),
        perm=perm,
        n=n,
        max_list_len=max_len,
    )


def cluster_starts(layout: PostingLayout) -> jax.Array:
    """Per-cluster start rows, indexed by cluster id."""
    return layout.offsets[:-1]
