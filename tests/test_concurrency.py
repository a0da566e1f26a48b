"""Concurrent-access tests (parity: 4-thread concurrent search on a shared
index, /root/reference/tests/ivf_index_tests.rs:768-807)."""

import concurrent.futures

import numpy as np
import pytest

import vector_indexer_tpu as vx
from conftest import make_gaussian_clusters


@pytest.fixture(scope="module")
def shared_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conc")
    data, _, _ = make_gaussian_clusters(6, 100, 16, spread=0.3, separation=8.0)
    cfg = (
        vx.VectorIndexerConfig(16)
        .with_index_dir(tmp / "index")
        .with_shards_dir(tmp / "shards")
    )
    ix = vx.VectorIndexer(cfg).build_from_arrays(data)
    return ix, data


def test_concurrent_search_threads(shared_index):
    ix, data = shared_index

    def work(i):
        res = ix.search_sync(ix.search_request(data[i * 10]).with_k(5))
        return res[0].external_id == i * 10

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        assert all(ex.map(work, range(8)))


def test_concurrent_batched_search(shared_index):
    ix, data = shared_index

    def work(seed):
        q = data[seed * 7 : seed * 7 + 16]
        D, I = ix.search_batch(q, k=3, n_probe=6)
        return (I[:, 0] == np.arange(seed * 7, seed * 7 + 16)).all()

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        assert all(ex.map(work, range(4)))


def test_interleaved_results_deterministic(shared_index):
    ix, data = shared_index
    req = ix.search_request(data[3]).with_k(5)
    baseline = [r.external_id for r in ix.search_sync(req)]

    def work(_):
        return [r.external_id for r in ix.search_sync(req)] == baseline

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        assert all(ex.map(work, range(12)))
