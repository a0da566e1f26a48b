"""Multi-chip sharded search + data-parallel training tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.models import compute_inertia, run_kmeans_lloyd
from vector_indexer_tpu.parallel import (
    ShardedSearcher,
    make_shard_mesh,
    run_kmeans_lloyd_dp,
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


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_matches_single_chip(built, n_dev):
    idx, data = built
    mesh = make_shard_mesh(n_dev)
    searcher = ShardedSearcher(idx, mesh)
    q = data[:40]
    D1, I1 = idx.search_batch(q, k=10, n_probe=idx.num_clusters)
    D2, I2 = searcher.search_batch(q, k=10, n_probe=idx.num_clusters)
    # Single-chip may take the dense-matmul path; distances can differ by
    # f32 reduction-order noise.
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)
    # Distances identical => same neighbor sets (ties may permute).
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())


def test_sharded_probe_subset(built):
    idx, data = built
    mesh = make_shard_mesh(4)
    searcher = ShardedSearcher(idx, mesh)
    D, I = searcher.search_batch(data[:16], k=5, n_probe=3)
    assert (I[:, 0] == np.arange(16)).all()  # self-hit survives sharding
    assert (np.diff(D, axis=1) >= -1e-6).all()


def test_sharded_row_conservation(built):
    idx, _ = built
    mesh = make_shard_mesh(8)
    searcher = ShardedSearcher(idx, mesh)
    # Every internal id appears exactly once across device-local tables.
    ids = searcher.local_perm[searcher.local_perm >= 0]
    assert len(ids) == idx.layout.n
    assert len(np.unique(ids)) == idx.layout.n


def test_sharded_errors(built):
    idx, data = built
    searcher = ShardedSearcher(idx, make_shard_mesh(2))
    with pytest.raises(ValueError):
        searcher.search_batch(data[:2], k=0, n_probe=1)
    with pytest.raises(ValueError):
        searcher.search_batch(np.zeros((2, 7), np.float32), k=1, n_probe=1)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_stream_body_matches_dense(built, n_dev, monkeypatch):
    """The block-stream Pallas body under shard_map must return the same
    result sets as the masked-dense body (bf16 residual sweep + exact f32
    re-rank -> identical ids, near-identical distances). Re-rank forced
    on; the no-re-rank default's contract is covered in
    test_fused_stream.py."""
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    mesh = make_shard_mesh(n_dev)
    s_dense = ShardedSearcher(idx, mesh, method="dense")
    s_stream = ShardedSearcher(idx, mesh, method="stream")
    q = data[:32] + 0.01
    D1, I1 = s_dense.search_batch(q, 10, 6)
    D2, I2 = s_stream.search_batch(q, 10, 6)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())
    # f32 reduction-order noise between the dense matmul and the re-rank
    # einsum (same tolerance as the single-chip cross-path tests).
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)


def test_sharded_stream_full_probe_self_hit(built):
    idx, data = built
    s = ShardedSearcher(idx, make_shard_mesh(4), method="stream")
    D, I = s.search_batch(data[:16], k=5, n_probe=idx.num_clusters)
    assert (I[:, 0] == np.arange(16)).all()
    assert (D[:, 0] < 1e-3).all()


def test_sharded_dense_fused_body_matches_dense():
    """The fused Pallas local sweep under shard_map returns the same
    leading results as the XLA masked-dense body (plane tail loss only);
    d=128 and a large-enough local slice so plan_fused accepts."""
    rng = np.random.default_rng(5)
    n, d, k = 6000, 128, 10
    centers = rng.normal(0, 6.0, size=(12, d)).astype(np.float32)
    data = (centers[rng.integers(0, 12, n)]
            + rng.normal(0, 0.4, (n, d))).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42)
    mesh = make_shard_mesh(2)
    s_dense = ShardedSearcher(idx, mesh, method="dense")
    s_fused = ShardedSearcher(idx, mesh, method="dense_fused")
    from vector_indexer_tpu.ops.pallas.flat_sweep import plan_fused

    rows_local = s_fused._host_tables.local_vecs.shape[1]
    assert plan_fused(rows_local, d, 24, k) is not None  # gate accepts
    q = data[:24] + 0.01
    for n_probe in (4, idx.num_clusters):
        D1, I1 = s_dense.search_batch(q, k, n_probe)
        D2, I2 = s_fused.search_batch(q, k, n_probe)
        np.testing.assert_array_equal(I1[:, 0], I2[:, 0])
        for a, b, da, db in zip(I1, I2, D1, D2):
            shared = set(a.tolist()) & set(b.tolist())
            assert len(shared) >= k - 2
            for r in shared:
                ia, ib = list(a).index(r), list(b).index(r)
                # q_sq is added after selection in the fused path (order
                # noise on near-zero self-distances), and the serving
                # sweep is the 3pass bf16 hi/lo split which INTERPRET
                # mode accumulates in bf16 (unlike the MXU's f32
                # accumulators — on-chip delta is <= ~2e-3): allow 3e-2.
                np.testing.assert_allclose(
                    da[ia], db[ib], rtol=1e-3, atol=3e-2
                )


def test_2d_stream_body_matches_dense(built, monkeypatch):
    """The block-stream body on the 2-D mesh (queries x shards) returns
    the same result sets as the 2-D dense body (re-rank forced on)."""
    from vector_indexer_tpu.parallel import Sharded2DSearcher, make_mesh_2d

    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    mesh = make_mesh_2d(2, 4)
    s_dense = Sharded2DSearcher(idx, mesh, method="dense")
    s_stream = Sharded2DSearcher(idx, mesh, method="stream")
    q = data[:32] + 0.01
    D1, I1 = s_dense.search_batch(q, 10, 6)
    D2, I2 = s_stream.search_batch(q, 10, 6)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)


def test_2d_dense_fused_matches_dense():
    from vector_indexer_tpu.parallel import Sharded2DSearcher, make_mesh_2d

    rng = np.random.default_rng(7)
    n, d, k = 6000, 128, 10
    centers = rng.normal(0, 6.0, size=(12, d)).astype(np.float32)
    data = (centers[rng.integers(0, 12, n)]
            + rng.normal(0, 0.4, (n, d))).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42)
    mesh = make_mesh_2d(2, 2)
    s_dense = Sharded2DSearcher(idx, mesh, method="dense")
    s_fused = Sharded2DSearcher(idx, mesh, method="dense_fused")
    q = data[:16] + 0.01
    D1, I1 = s_dense.search_batch(q, k, 6)
    D2, I2 = s_fused.search_batch(q, k, 6)
    np.testing.assert_array_equal(I1[:, 0], I2[:, 0])
    for a, b in zip(I1, I2):
        assert len(set(a.tolist()) & set(b.tolist())) >= k - 2


def test_sharded_spill_dedup(built):
    """Spilled index under sharding: the two copies of a vector may land on
    different devices; the merge must still never return duplicate ids."""
    _, data = built
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    sp = IvfIndex.fit(store, seed=42, spill=1)
    for method in ("dense", "stream"):
        s = ShardedSearcher(sp, make_shard_mesh(4), method=method)
        D, I = s.search_batch(data[:24], k=10, n_probe=sp.num_clusters)
        for row in I:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real), method
        assert (I[:, 0] == np.arange(24)).all(), method


@pytest.mark.parametrize("metric", ["ip", "cosine"])
def test_sharded_metric_parity(metric):
    """The dense per-device body must rank by the index metric, not L2,
    and cosine queries must be normalized — results match the single-chip
    path on ip/cosine indexes."""
    data, _, _ = make_gaussian_clusters(10, 120, 24, spread=0.5, separation=6.0)
    data = data + 2.0  # break norm uniformity so ip != l2 ranking
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42, metric=metric)
    searcher = ShardedSearcher(idx, make_shard_mesh(4), method="dense")
    q = data[:24] * 1.7  # un-normalized queries exercise cosine handling
    D1, I1 = idx.search_batch(q, k=8, n_probe=idx.num_clusters)
    D2, I2 = searcher.search_batch(q, k=8, n_probe=idx.num_clusters)
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())


def test_multihost_metric_parity():
    from vector_indexer_tpu.parallel import MultiHostSearcher, make_mesh_hosts

    data, _, _ = make_gaussian_clusters(10, 120, 24, spread=0.5, separation=6.0)
    data = data + 2.0
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42, metric="ip")
    mh = MultiHostSearcher(idx, make_mesh_hosts(2, 2), method="dense")
    q = data[:16]
    D1, I1 = idx.search_batch(q, k=8, n_probe=idx.num_clusters)
    D2, I2 = mh.search_batch(q, k=8, n_probe=idx.num_clusters)
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())


def test_sharded_construction_uses_host_mirror(built, monkeypatch):
    """Constructing searchers must not fetch the corpus-sized HBM table
    (minutes over the real tunnel): local tables come from the host
    mirror."""
    idx, _ = built
    import vector_indexer_tpu.parallel.sharded as sh

    real_asarray = np.asarray

    def guard(a, *args, **kw):
        if hasattr(a, "shape") and getattr(a, "ndim", 0) == 2 and a is idx.layout.vectors:
            raise AssertionError("corpus-sized d2h fetch during construction")
        return real_asarray(a, *args, **kw)

    monkeypatch.setattr(sh.np, "asarray", guard)
    ShardedSearcher(idx, make_shard_mesh(2))
    from vector_indexer_tpu.parallel.mesh2d import Sharded2DSearcher, make_mesh_2d

    Sharded2DSearcher(idx, make_mesh_2d(2, 2))


def test_dp_kmeans_quality():
    data, _, _ = make_gaussian_clusters(6, 200, 16, spread=0.3, separation=9.0)
    mesh = make_shard_mesh(8)
    dp = run_kmeans_lloyd_dp(data, k=6, max_iters=50, mesh=mesh, seed=3)
    single = run_kmeans_lloyd(data, k=6, max_iters=50, seed=3)
    i_dp = compute_inertia(data, dp.centroids, dp.labels)
    i_single = compute_inertia(data, single.centroids, single.labels)
    assert i_dp <= i_single * 1.2
    lbl = np.asarray(dp.labels)
    assert lbl.shape == (len(data),)
    assert lbl.min() >= 0 and lbl.max() < 6


def test_dp_kmeans_replicated_repair():
    """Empty-cluster repair must keep the replicated centroids identical on
    every device. Detector: each device computes ITS slice's final labels
    against ITS centroid copy — if the copies diverged, those labels are
    inconsistent with the returned (device-0) centroids."""
    # Few distinct points + large k forces empty clusters every iteration.
    base = np.random.default_rng(0).normal(size=(12, 16)).astype(np.float32)
    data = np.repeat(base, 40, axis=0)  # 480 points, 12 distinct
    mesh = make_shard_mesh(8)
    res = run_kmeans_lloyd_dp(data, k=32, max_iters=10, mesh=mesh, seed=7)
    cents = np.asarray(res.centroids)
    lbl = np.asarray(res.labels)
    d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    expect = d2.argmin(1)
    # Ties can legitimately differ; require distance-equivalence instead.
    got = d2[np.arange(len(data)), lbl]
    best = d2[np.arange(len(data)), expect]
    np.testing.assert_allclose(got, best, rtol=1e-5, atol=1e-5)


def test_2d_mesh_query_shard_parallel(built):
    from vector_indexer_tpu.parallel.mesh2d import Sharded2DSearcher, make_mesh_2d

    idx, data = built
    mesh = make_mesh_2d(2, 4)
    searcher = Sharded2DSearcher(idx, mesh)
    q = data[:48]
    D1, I1 = idx.search_batch(q, k=10, n_probe=idx.num_clusters)
    D2, I2 = searcher.search_batch(q, k=10, n_probe=idx.num_clusters)
    np.testing.assert_allclose(D1, D2, rtol=1e-3, atol=5e-4)
    for a, b in zip(I1, I2):
        assert set(a.tolist()) == set(b.tolist())


def test_2d_mesh_self_hit(built):
    from vector_indexer_tpu.parallel.mesh2d import Sharded2DSearcher, make_mesh_2d

    idx, data = built
    searcher = Sharded2DSearcher(idx, make_mesh_2d(4, 2))
    D, I = searcher.search_batch(data[:16], k=5, n_probe=6)
    assert (I[:, 0] == np.arange(16)).all()


def test_mesh_parallel_fit_quality():
    """IvfIndex.fit(mesh=...) must match the single-device build's quality:
    same cluster count scale, conservation, near-equal inertia, and working
    search with self-hits."""
    from benchmarks.cpu_ivf import labels_from_layout
    from vector_indexer_tpu.models import compute_inertia

    data, _, _ = make_gaussian_clusters(8, 150, 16, spread=0.4, separation=8.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    mesh = make_shard_mesh(8)
    idx_dp = IvfIndex.fit(store, seed=11, mesh=mesh)
    idx_1 = IvfIndex.fit(store, seed=11)

    # Conservation: every vector is in exactly one posting list.
    assert int(np.asarray(idx_dp.layout.lengths).sum()) == len(data)

    lbl_dp = labels_from_layout(idx_dp.layout, idx_dp.num_clusters, len(data))
    lbl_1 = labels_from_layout(idx_1.layout, idx_1.num_clusters, len(data))
    i_dp = compute_inertia(data, idx_dp.centroids, lbl_dp)
    i_1 = compute_inertia(data, idx_1.centroids, lbl_1)
    assert i_dp <= i_1 * 1.2  # reference-style stability bound

    D, I = idx_dp.search_batch(data[:32], k=5, n_probe=idx_dp.num_clusters)
    assert (I[:, 0] == np.arange(32)).all()


def test_mesh_parallel_fit_rejects_mini_batch():
    data, _, _ = make_gaussian_clusters(4, 50, 8)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    with pytest.raises(ValueError, match="mesh-parallel"):
        IvfIndex.fit(store, mesh=make_shard_mesh(2), trainer="mini_batch")
