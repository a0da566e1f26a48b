"""Public API tests.

Ports /root/reference/tests/api_tests.rs: config defaults, build->load->search
roundtrip through configured dirs, default/override/clamping of k & n_probe,
include_vectors payload control, error paths (missing index, empty records,
dim mismatches, k/n_probe = 0), vector-file builds. Uses timestamped temp
dirs like the reference (api_tests.rs:4-10) via pytest tmp_path.
"""

import asyncio

import numpy as np
import pytest

import vector_indexer_tpu as vx
from vector_indexer_tpu.utils import generate_test_vectors


def _cfg(tmp_path, dim=16):
    return (
        vx.VectorIndexerConfig(dim)
        .with_index_dir(tmp_path / "index")
        .with_shards_dir(tmp_path / "shards")
    )


def _records(n, dim, seed=0):
    g = np.random.default_rng(seed)
    data = g.normal(size=(n, dim)).astype(np.float32)
    return [vx.VectorRecord(i, data[i]) for i in range(n)], data


def test_config_defaults():
    cfg = vx.VectorIndexerConfig(128)
    assert cfg.dimension == 128
    assert str(cfg.index_dir) == "index"
    assert str(cfg.shards_dir) == "shards"
    assert cfg.default_k == 10
    assert cfg.default_n_probe == 20
    assert cfg.max_k == 10_000
    assert cfg.max_n_probe == 10_000


def test_builder_setters(tmp_path):
    cfg = _cfg(tmp_path)
    assert cfg.index_dir == tmp_path / "index"
    assert cfg.shards_dir == tmp_path / "shards"


def test_build_load_search_roundtrip(tmp_path):
    records, data = _records(400, 16)
    cfg = _cfg(tmp_path)
    vx.VectorIndexer(cfg).build_from_records(records)
    assert (tmp_path / "index" / "index.bin").exists()
    assert any((tmp_path / "shards").glob("shard_*.bin"))

    ix = vx.VectorIndexer.load(cfg)
    req = ix.search_request(data[42]).with_k(5).with_n_probe(10)
    res = ix.search_sync(req)
    assert res[0].external_id == 42
    assert res[0].distance < 1e-3
    assert res[0].vector is None


def test_async_search(tmp_path):
    records, data = _records(200, 8)
    cfg = _cfg(tmp_path, dim=8)
    ix = vx.VectorIndexer(cfg).build_from_records(records)
    res = asyncio.run(ix.search(ix.search_request(data[5])))
    assert res[0].external_id == 5


def test_defaults_and_clamping(tmp_path):
    records, data = _records(300, 8)
    cfg = _cfg(tmp_path, dim=8)
    ix = vx.VectorIndexer(cfg).build_from_records(records)
    # default k
    res = ix.search_sync(ix.search_request(data[0]))
    assert len(res) == cfg.default_k
    # k clamped to max_k (no error)
    res = ix.search_sync(ix.search_request(data[0]).with_k(999_999))
    assert len(res) <= cfg.max_k
    # n_probe clamped to max_n_probe (no error)
    res = ix.search_sync(
        ix.search_request(data[0]).with_n_probe(999_999).with_k(3)
    )
    assert len(res) == 3


def test_include_vectors_payload(tmp_path):
    records, data = _records(150, 8)
    cfg = _cfg(tmp_path, dim=8)
    ix = vx.VectorIndexer(cfg).build_from_records(records)
    res = ix.search_sync(
        ix.search_request(data[3]).with_include_vectors(True).with_k(2)
    )
    np.testing.assert_allclose(res[0].vector, data[3], atol=1e-5)
    res2 = ix.search_sync(ix.search_request(data[3]).with_k(2))
    assert res2[0].vector is None


def test_load_missing_index_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        vx.VectorIndexer.load(_cfg(tmp_path))


def test_empty_records_error(tmp_path):
    with pytest.raises(ValueError, match="no vectors"):
        vx.VectorIndexer(_cfg(tmp_path)).build_from_records([])


def test_huge_external_ids_rejected(tmp_path):
    # ids >= 2^63 would wrap negative through the int64 (D, I) contract and
    # alias the -1 padding sentinel; API builds must reject them.
    g = np.random.default_rng(0)
    vecs = g.normal(size=(50, 8)).astype(np.float32)
    ids = np.arange(50, dtype=np.uint64)
    ids[7] = np.uint64(2**63)
    with pytest.raises(ValueError, match="2\\*\\*63"):
        vx.VectorIndexer(_cfg(tmp_path, dim=8)).build_from_arrays(
            vecs, external_ids=ids
        )


def test_build_dim_mismatch(tmp_path):
    records, _ = _records(50, 8)
    with pytest.raises(ValueError, match="dimension mismatch at index"):
        vx.VectorIndexer(_cfg(tmp_path, dim=16)).build_from_records(records)


def test_search_dim_mismatch(tmp_path):
    records, data = _records(100, 8)
    ix = vx.VectorIndexer(_cfg(tmp_path, dim=8)).build_from_records(records)
    with pytest.raises(ValueError, match="dimension mismatch"):
        ix.search_sync(ix.search_request(np.zeros(16, np.float32)))


def test_k_zero_and_nprobe_zero_errors(tmp_path):
    records, data = _records(100, 8)
    ix = vx.VectorIndexer(_cfg(tmp_path, dim=8)).build_from_records(records)
    with pytest.raises(ValueError):
        ix.search_sync(ix.search_request(data[0]).with_k(0))
    with pytest.raises(ValueError):
        ix.search_sync(ix.search_request(data[0]).with_n_probe(0))


def test_build_from_vector_file(tmp_path):
    f = tmp_path / "vecs.bin"
    generate_test_vectors(str(f), 300, 8, seed=1)
    cfg = _cfg(tmp_path, dim=8)
    ix = vx.VectorIndexer(cfg).build_from_vector_file(f)
    res = ix.search_sync(ix.search_request(np.zeros(8, np.float32)).with_k(3))
    assert len(res) == 3


def test_build_from_vector_file_dim_mismatch(tmp_path):
    f = tmp_path / "vecs.bin"
    generate_test_vectors(str(f), 100, 8, seed=1)
    with pytest.raises(ValueError, match="dimension mismatch"):
        vx.VectorIndexer(_cfg(tmp_path, dim=16)).build_from_vector_file(f)


def test_bindings_build_search_load(tmp_path):
    g = np.random.default_rng(0)
    xb = g.normal(size=(500, 12)).astype(np.float32)
    index = vx.build(xb, work_dir=str(tmp_path))
    D, I = index.search_sync(xb[:8], k=4, n_probe=8)
    assert D.shape == (8, 4) and I.shape == (8, 4)
    assert (I[:, 0] == np.arange(8)).all()  # self-hit first
    assert (np.diff(D, axis=1) >= -1e-6).all()  # sorted rows

    # load back
    index2 = vx.load(str(tmp_path / "index"), str(tmp_path / "shards"), 12)
    D2, I2 = index2.search_sync(xb[:8], k=4, n_probe=8)
    np.testing.assert_array_equal(I, I2)
    np.testing.assert_allclose(D, D2, rtol=1e-5, atol=1e-6)


def test_bindings_padding_contract(tmp_path):
    xb = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    index = vx.build(xb, work_dir=str(tmp_path))
    D, I = index.search_sync(xb[:2], k=10, n_probe=100)
    assert D.shape == (2, 10)
    assert np.isinf(D[:, 6:]).all()
    assert (I[:, 6:] == -1).all()


def test_bindings_async(tmp_path):
    xb = np.random.default_rng(0).normal(size=(100, 8)).astype(np.float32)
    index = vx.build(xb, work_dir=str(tmp_path))
    D, I = asyncio.run(index.search(xb[:3], k=2, n_probe=5))
    assert I[0, 0] == 0


def test_suggest_nlist():
    assert vx.suggest_nlist(9_999) == int(9_999**0.5)
    assert vx.suggest_nlist(50_000) == 2 * int(np.ceil(50_000**0.5))
    assert vx.suggest_nlist(1_000_000) == 4000


def test_staged_device_queries(tmp_path):
    # Pre-staged jax-array queries (the serving hot path) must give the same
    # results as the numpy path.
    import jax.numpy as jnp

    g = np.random.default_rng(3)
    xb = g.normal(size=(300, 8)).astype(np.float32)
    index = vx.build(xb, work_dir=str(tmp_path))
    xq = xb[:16]
    D1, I1 = index.search_sync(xq, 4, 8)
    xq_dev = index.stage_queries(xq)
    Dd, rows = index.search_device(xq_dev, 4, 8)
    I2 = index.rows_to_external(np.asarray(rows)[:16])
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, np.asarray(Dd)[:16], rtol=1e-5, atol=1e-6)
