"""Balanced (capacity-penalized) Lloyd trainer.

Beyond-reference capability: the reference's mini-batch trainer produces
heavily skewed cells (its recall depends on them, kmeans.rs:64-150); the
balanced option bounds posting-list skew by construction so tail cells
stop dictating gather budgets, stream slot counts, and per-shard load.
"""

import numpy as np

from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.models import run_kmeans_balanced, run_kmeans_lloyd
from vector_indexer_tpu.storage import VectorStore


def _skew(labels, k):
    counts = np.bincount(np.asarray(labels), minlength=k)
    return counts.max() / max(counts.mean(), 1e-9), counts


def test_balanced_reduces_skew_isotropic():
    g = np.random.default_rng(0)
    data = g.standard_normal((6000, 16)).astype(np.float32)
    k = 32
    base = run_kmeans_lloyd(data, k, 25, seed=42)
    bal = run_kmeans_balanced(data, k, 25, balance=1.0, seed=42)
    r_base, _ = _skew(base.labels, k)
    r_bal, counts = _skew(bal.labels, k)
    assert counts.sum() == len(data)  # conservation
    assert r_bal <= r_base + 1e-6
    assert r_bal < 1.7, (r_bal, r_base)


def test_balanced_quality_stays_close():
    from vector_indexer_tpu.models import compute_inertia

    g = np.random.default_rng(1)
    data = g.standard_normal((4000, 12)).astype(np.float32)
    base = run_kmeans_lloyd(data, 20, 25, seed=42)
    bal = run_kmeans_balanced(data, 20, 25, balance=1.0, seed=42)
    i_base = compute_inertia(data, base.centroids, base.labels)
    i_bal = compute_inertia(data, bal.centroids, bal.labels)
    # Balancing trades a bounded amount of quantization error for the
    # capacity bound (the reference's own mini-batch/full-batch quality
    # test uses a 1.5x band, kmeans_tests.rs:541-579).
    assert i_bal <= 1.5 * i_base, (i_bal, i_base)


def test_balanced_splits_point_mass():
    """A tight blob holding half the corpus: plain Lloyd leaves it as one
    16x-target cell; the clone-split mechanism must break it up."""
    g = np.random.default_rng(0)
    tight = 0.05 * g.standard_normal((3000, 16)).astype(np.float32)
    wide = 4.0 * g.standard_normal((3000, 16)).astype(np.float32) + 8.0
    data = np.vstack([tight, wide]).astype(np.float32)
    k = 32
    base = run_kmeans_lloyd(data, k, 60, seed=42)
    bal = run_kmeans_balanced(data, k, 60, balance=1.0, seed=42)
    r_base, _ = _skew(base.labels, k)
    r_bal, counts = _skew(bal.labels, k)
    assert counts.sum() == len(data)
    assert r_base > 8  # the failure mode actually present
    assert r_bal < 4, (r_bal, r_base)


def test_balanced_labels_valid():
    g = np.random.default_rng(2)
    data = g.standard_normal((1000, 8)).astype(np.float32)
    res = run_kmeans_balanced(data, 10, 15, balance=2.0, seed=7)
    labels = np.asarray(res.labels)
    assert labels.shape == (1000,)
    assert labels.min() >= 0 and labels.max() < 10


def test_fit_balanced_trainer_end_to_end():
    g = np.random.default_rng(3)
    data = g.standard_normal((5000, 24)).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42, trainer="balanced")
    lengths = np.asarray(idx.layout.lengths)
    assert lengths.sum() == len(data)
    assert lengths.max() / max(lengths.mean(), 1e-9) < 2.0
    # Self-hit search still works through the bounded layout.
    D, I = idx.search_batch(data[:16], 5, 8)
    assert (I[:, 0] == np.arange(16)).all()
    assert D[:, 0].max() < 1e-3
