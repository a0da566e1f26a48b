"""Posting-layout invariants: alignment, sentinels, CSR integrity."""

import numpy as np

from vector_indexer_tpu.storage.layout import (
    ALIGN,
    SENTINEL_NORM,
    build_layout,
)


def _mk(n=100, k=7, d=8, seed=0):
    g = np.random.default_rng(seed)
    vectors = g.normal(size=(n, d)).astype(np.float32)
    labels = g.integers(0, k, n)
    return vectors, labels, k


def test_alignment_and_conservation():
    vectors, labels, k = _mk()
    lay = build_layout(vectors, labels, k)
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    assert (starts % ALIGN == 0).all()
    assert lengths.sum() == len(vectors)
    real = lay.perm >= 0
    assert real.sum() == len(vectors)
    assert len(np.unique(lay.perm[real])) == len(vectors)


def test_rows_roundtrip_to_vectors():
    vectors, labels, k = _mk(seed=3)
    lay = build_layout(vectors, labels, k)
    table = np.asarray(lay.vectors)
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    for c in range(k):
        s, m = int(starts[c]), int(lengths[c])
        for r in range(s, s + m):
            internal = lay.perm[r]
            assert labels[internal] == c
            np.testing.assert_array_equal(table[r], vectors[internal])


def test_gap_rows_are_sentinels():
    vectors, labels, k = _mk(n=50, k=5, seed=1)
    lay = build_layout(vectors, labels, k)
    norms = np.asarray(lay.row_norms)
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    covered = np.zeros(lay.vectors.shape[0], bool)
    for c in range(k):
        covered[starts[c] : starts[c] + lengths[c]] = True
    assert (norms[~covered] == SENTINEL_NORM).all()
    assert (norms[covered] < 1e10).all()


def test_cluster_order_groups_contiguously():
    vectors, labels, k = _mk(n=80, k=6, seed=2)
    order = np.array([3, 1, 5, 0, 2, 4])
    lay = build_layout(vectors, labels, k, cluster_order=order)
    starts = np.asarray(lay.offsets)[:-1]
    # Placement rank must follow cluster_order.
    assert (np.argsort(starts[order], kind="stable") == np.arange(k)).all()


def test_empty_clusters_allowed():
    vectors = np.ones((10, 4), np.float32)
    labels = np.zeros(10, np.int64)  # everything in cluster 0 of 3
    lay = build_layout(vectors, labels, 3)
    lengths = np.asarray(lay.lengths)
    assert lengths[0] == 10 and lengths[1] == 0 and lengths[2] == 0
