"""Multi-host hierarchical search tests (8 virtual CPU devices).

The (hosts, shards) mesh must return the same result set as the flat 1-D
sharded searcher and the single-chip path: the hierarchical ICI-then-DCN
merge is a pure re-association of the flat top-k merge (min is
associative), so only tie order may differ. Mirrors the reference's
shard fan-out correctness tests (/root/reference/tests/ivf_index_tests.rs)
one topology level up.
"""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.parallel import (
    MultiHostSearcher,
    ShardedSearcher,
    make_mesh_hosts,
    make_shard_mesh,
)
from vector_indexer_tpu.storage import VectorStore


@pytest.fixture(scope="module")
def built():
    data, _, _ = make_gaussian_clusters(12, 120, 24, spread=0.4, separation=8.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42)
    return idx, data


@pytest.mark.parametrize("hs", [(2, 4), (4, 2), (2, 2), (1, 8)])
def test_multihost_matches_single_chip(built, hs):
    idx, data = built
    H, S = hs
    mh = MultiHostSearcher(idx, make_mesh_hosts(H, S))
    q = data[:40]
    D1, I1 = idx.search_batch(q, k=10, n_probe=idx.num_clusters)
    D2, I2 = mh.search_batch(q, k=10, n_probe=idx.num_clusters)
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())


def test_multihost_matches_flat_sharded(built):
    idx, data = built
    mh = MultiHostSearcher(idx, make_mesh_hosts(2, 4))
    flat = ShardedSearcher(idx, make_shard_mesh(8), method="dense")
    q = data[:32]
    for n_probe in (3, idx.num_clusters):
        D1, I1 = flat.search_batch(q, k=8, n_probe=n_probe)
        D2, I2 = mh.search_batch(q, k=8, n_probe=n_probe)
        np.testing.assert_allclose(D1, D2, rtol=1e-4, atol=1e-5)
        for a, b in zip(I1, I2):
            assert set(a.tolist()) == set(b.tolist())


def test_multihost_probe_subset_and_order(built):
    idx, data = built
    mh = MultiHostSearcher(idx, make_mesh_hosts(2, 4))
    D, I = mh.search_batch(data[:16], k=5, n_probe=3)
    assert (I[:, 0] == np.arange(16)).all()  # self-hit survives sharding
    assert (np.diff(D, axis=1) >= -1e-6).all()


def test_multihost_row_conservation(built):
    idx, _ = built
    mh = MultiHostSearcher(idx, make_mesh_hosts(2, 4))
    ids = mh.local_perm[mh.local_perm >= 0]
    assert len(ids) == idx.layout.n
    assert len(np.unique(ids)) == idx.layout.n


def test_multihost_spilled_index_dedups():
    data, _, _ = make_gaussian_clusters(10, 80, 16, spread=0.5, separation=6.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    sp = IvfIndex.fit(store, seed=7, spill=1)
    mh = MultiHostSearcher(sp, make_mesh_hosts(2, 4))
    D, I = mh.search_batch(data[:24], k=6, n_probe=4)
    for row in I:
        real = row[row >= 0]
        assert len(np.unique(real)) == len(real)  # no duplicate ids
    assert (I[:, 0] == np.arange(24)).all()


def test_multihost_stream_body_matches_dense(built, monkeypatch):
    """The block-stream body under the hierarchical merge returns the same
    result sets as the masked-dense body (bf16 residual sweep + exact f32
    re-rank -> identical ids, near-identical distances). The re-rank is
    forced on: the no-re-rank default returns exact-to-quantized-point
    distances (covered by test_fused_stream's default-contract test) whose
    near-boundary order can differ by one id."""
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    mesh = make_mesh_hosts(2, 4)
    mh_dense = MultiHostSearcher(idx, mesh, method="dense")
    mh_stream = MultiHostSearcher(idx, mesh, method="stream")
    q = data[:32] + 0.01
    D1, I1 = mh_dense.search_batch(q, 10, 6)
    D2, I2 = mh_stream.search_batch(q, 10, 6)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)


def test_multihost_stream_full_probe_self_hit(built):
    idx, data = built
    mh = MultiHostSearcher(idx, make_mesh_hosts(4, 2), method="stream")
    D, I = mh.search_batch(data[:16], k=5, n_probe=idx.num_clusters)
    assert (I[:, 0] == np.arange(16)).all()
    assert (D[:, 0] < 1e-3).all()


def test_multihost_dense_fused_matches_dense():
    """The fused Pallas local sweep also runs under the hierarchical
    merge (large slice + d=128 so the plan gate accepts)."""
    rng = np.random.default_rng(6)
    n, d, k = 6000, 128, 10
    centers = rng.normal(0, 6.0, size=(12, d)).astype(np.float32)
    data = (centers[rng.integers(0, 12, n)]
            + rng.normal(0, 0.4, (n, d))).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42)
    mesh = make_mesh_hosts(2, 1)
    mh_dense = MultiHostSearcher(idx, mesh, method="dense")
    mh_fused = MultiHostSearcher(idx, mesh, method="dense_fused")
    q = data[:8] + 0.01
    n_probe = 6
    D1, I1 = mh_dense.search_batch(q, k, n_probe)
    D2, I2 = mh_fused.search_batch(q, k, n_probe)
    np.testing.assert_array_equal(I1[:, 0], I2[:, 0])
    for a, b in zip(I1, I2):
        assert len(set(a.tolist()) & set(b.tolist())) >= k - 2


def test_multihost_errors(built):
    idx, data = built
    mh = MultiHostSearcher(idx, make_mesh_hosts(2, 2))
    with pytest.raises(ValueError):
        mh.search_batch(data[:4], k=0, n_probe=2)
    with pytest.raises(ValueError):
        mh.search_batch(data[:4], k=3, n_probe=0)
    with pytest.raises(ValueError):
        mh.search_batch(data[:4, :8], k=3, n_probe=2)
    with pytest.raises(ValueError):
        make_mesh_hosts(4, 4)  # 16 > 8 devices
