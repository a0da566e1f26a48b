"""IVF index core tests.

Ports the behavioral contract of /root/reference/tests/ivf_index_tests.rs:
build geometry, exact-match self-hit, exactly-k sorted results, n_probe
effects, conservation (sum of posting lists == n), no duplicate ids,
recall floors vs brute force, degenerate inputs.
"""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.ops import brute_force_topk
from vector_indexer_tpu.storage import VectorStore


def _store(data, ext_offset=0):
    n = data.shape[0]
    return VectorStore(
        external_ids=np.arange(ext_offset, ext_offset + n, dtype=np.uint64),
        vectors=data,
        timestamps=np.arange(1, n + 1, dtype=np.uint64),
    )


@pytest.fixture(scope="module")
def built_index():
    data, _, _ = make_gaussian_clusters(10, 100, 32, spread=0.3, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=42)
    return idx, data


def test_fit_geometry(built_index):
    idx, data = built_index
    assert idx.dimension == 32
    assert 1 <= idx.num_clusters <= len(data)
    assert idx.num_shards >= 1
    assert idx.centroids_to_shard.shape == (idx.num_clusters,)
    assert (idx.centroids_to_shard >= 0).all()
    assert (idx.centroids_to_shard < idx.num_shards).all()


def test_conservation_and_no_duplicates(built_index):
    # Sum of posting-list lengths == n; every internal id appears exactly once
    # (parity: ivf_index_tests.rs:550-653).
    idx, data = built_index
    lengths = np.asarray(idx.layout.lengths)
    assert lengths.sum() == len(data)
    assert lengths.min() > 0  # empty lists were filtered
    real = idx.layout.perm[idx.layout.perm >= 0]
    assert len(real) == len(data)
    assert len(np.unique(real)) == len(data)


def test_exact_match_returns_itself(built_index):
    idx, data = built_index
    res = idx.search(data[17], k=1, n_probe=5)
    assert len(res) == 1
    ext, dist, vec = res[0]
    assert ext == 17
    assert dist < 0.1
    np.testing.assert_allclose(vec, data[17], atol=1e-5)


def test_exactly_k_sorted(built_index):
    idx, data = built_index
    res = idx.search(data[3], k=10, n_probe=10)
    assert len(res) == 10
    dists = [r[1] for r in res]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)


def test_batched_matches_single(built_index):
    idx, data = built_index
    q = data[:32]
    D, I = idx.search_batch(q, k=5, n_probe=10)
    assert D.shape == (32, 5) and I.shape == (32, 5)
    for i in (0, 7, 31):
        singles = idx.search(q[i], k=5, n_probe=10)
        np.testing.assert_allclose(
            D[i][: len(singles)], [s[1] for s in singles], rtol=1e-5, atol=1e-5
        )


def test_n_probe_monotone_recall(built_index):
    idx, data = built_index
    rng = np.random.default_rng(0)
    q = data[rng.choice(len(data), 50, replace=False)] + rng.normal(
        0, 0.05, (50, 32)
    ).astype(np.float32)
    _, gt = brute_force_topk(q, data, 10)
    gt0 = np.asarray(gt)[:, 0]

    def recall_at(n_probe):
        _, internal = idx.search_batch(q, k=10, n_probe=n_probe)
        ext = np.where(internal >= 0, internal, -1)
        return np.mean([(gt0[i] in ext[i]) for i in range(len(q))])

    r_low, r_high = recall_at(1), recall_at(idx.num_clusters)
    assert r_high >= r_low
    assert r_high >= 0.99  # probing everything == exact
    assert recall_at(5) >= 0.5  # parity floor (ivf_index_tests.rs:465-498)


def test_k_greater_than_n():
    data = np.random.default_rng(1).normal(size=(20, 8)).astype(np.float32)
    idx = IvfIndex.fit(_store(data), seed=1)
    res = idx.search(data[0], k=50, n_probe=idx.num_clusters)
    assert len(res) == 20  # all points, no padding junk


def test_single_vector():
    data = np.ones((1, 16), dtype=np.float32)
    idx = IvfIndex.fit(_store(data), seed=5)
    res = idx.search(data[0], k=1, n_probe=1)
    assert len(res) == 1 and res[0][0] == 0


def test_k_zero_and_nprobe_zero_error(built_index):
    idx, data = built_index
    with pytest.raises(ValueError):
        idx.search(data[0], k=0, n_probe=5)
    with pytest.raises(ValueError):
        idx.search(data[0], k=5, n_probe=0)


def test_query_dim_mismatch(built_index):
    idx, _ = built_index
    with pytest.raises(ValueError, match="dimension mismatch"):
        idx.search(np.zeros(7, np.float32), k=5, n_probe=5)


def test_nprobe_exceeding_clusters_ok(built_index):
    idx, data = built_index
    res = idx.search(data[0], k=5, n_probe=10_000)
    assert len(res) == 5


def test_cluster_purity(built_index):
    # Points in a posting list should mostly share a true cluster
    # (parity: ivf_index_tests.rs:502-542 cluster purity > 50%).
    idx, data = built_index
    true_labels = np.repeat(np.arange(10), 100)
    lay = idx.layout
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    purities = []
    for c in range(idx.num_clusters):
        members = lay.perm[starts[c] : starts[c] + lengths[c]]
        if len(members) < 5:
            continue
        _, counts = np.unique(true_labels[members], return_counts=True)
        purities.append(counts.max() / counts.sum())
    assert np.mean(purities) > 0.5


def test_avg_recall_over_queries(built_index):
    # parity: avg recall >= 0.6 over 10 queries (ivf_index_tests.rs:690-728)
    idx, data = built_index
    rng = np.random.default_rng(3)
    q = data[rng.choice(len(data), 10, replace=False)]
    _, gt = brute_force_topk(q, data, 10)
    gt = np.asarray(gt)
    _, internal = idx.search_batch(q, k=10, n_probe=5)
    recalls = [
        len(set(gt[i]) & set(internal[i][internal[i] >= 0])) / 10.0
        for i in range(10)
    ]
    assert np.mean(recalls) >= 0.6


def test_high_dim_1536():
    data = np.random.default_rng(2).normal(size=(300, 1536)).astype(np.float32)
    idx = IvfIndex.fit(_store(data), seed=2)
    res = idx.search(data[5], k=3, n_probe=idx.num_clusters)
    assert res[0][0] == 5
