"""Inner-product / cosine metric tests (beyond-reference capability)."""

import numpy as np
import pytest

from vector_indexer_tpu.index import IvfIndex, load_index_from
from vector_indexer_tpu.storage import VectorStore


def _store(data):
    return VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )


@pytest.fixture(scope="module")
def data():
    g = np.random.default_rng(5)
    return g.normal(size=(800, 24)).astype(np.float32)


def _np_ip_topk(q, db, k):
    sims = db @ q
    return np.argsort(-sims)[:k]


def test_ip_flat_matches_numpy(data):
    idx = IvfIndex.fit(_store(data), seed=1, metric="ip")
    q = data[7] * 0.5 + 0.1
    D, I = idx.search_batch(q[None, :], 10, idx.num_clusters, method="flat")
    want = _np_ip_topk(q, data, 10)
    assert set(I[0].tolist()) == set(want.tolist())
    # D = negated inner product, ascending.
    sims = data[I[0]] @ q
    np.testing.assert_allclose(np.asarray(D[0]), -sims, rtol=1e-4, atol=1e-4)


def test_ip_dense_and_gather_agree(data):
    idx = IvfIndex.fit(_store(data), seed=1, metric="ip")
    q = data[:16]
    Dd, Id = idx.search_batch(q, 5, idx.num_clusters, method="dense")
    Dg, Ig = idx.search_batch(q, 5, idx.num_clusters, method="gather")
    for a, b in zip(Id, Ig):
        assert set(a.tolist()) == set(b.tolist())


def test_cosine_matches_numpy(data):
    idx = IvfIndex.fit(_store(data), seed=2, metric="cosine")
    q = data[3] * 7.0  # scale-invariant under cosine
    D, I = idx.search_batch(q[None, :], 5, idx.num_clusters, method="flat")
    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    want = np.argsort(-(dn @ qn))[:5]
    assert I[0, 0] == 3  # self-similarity is maximal
    assert set(I[0].tolist()) == set(want.tolist())


def test_metric_persisted(tmp_path, data):
    idx = IvfIndex.fit(_store(data), seed=3, metric="ip")
    idx.save_shards_to(tmp_path / "shards")
    idx.save_to(tmp_path / "index")
    back = load_index_from(tmp_path / "index", tmp_path / "shards")
    assert back.metric == "ip"
    q = data[11]
    D1, I1 = idx.search_batch(q[None, :], 5, 8)
    D2, I2 = back.search_batch(q[None, :], 5, 8)
    np.testing.assert_array_equal(I1, I2)


def test_invalid_metric_errors():
    with pytest.raises(ValueError, match="unsupported metric"):
        IvfIndex(8, metric="hamming")


def test_api_metric_roundtrip(tmp_path):
    import vector_indexer_tpu as vx

    g = np.random.default_rng(8)
    xb = g.normal(size=(300, 12)).astype(np.float32)
    index = vx.build(xb, work_dir=str(tmp_path), metric="cosine")
    D, I = index.search_sync(xb[:4] * 3.0, 3, 8)  # scale-invariant
    assert (I[:, 0] == np.arange(4)).all()
    index2 = vx.load(str(tmp_path / "index"), str(tmp_path / "shards"), 12)
    assert index2._indexer.index.metric == "cosine"
    D2, I2 = index2.search_sync(xb[:4] * 3.0, 3, 8)
    np.testing.assert_array_equal(I, I2)


def test_spherical_kmeans_unit_centroids():
    from vector_indexer_tpu.models import run_kmeans_mini_batch

    g = np.random.default_rng(9)
    d = g.normal(size=(500, 12)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = run_kmeans_mini_batch(d, 8, 30, seed=1, spherical=True)
    norms = np.linalg.norm(np.asarray(res.centroids), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
