"""Utils layer tests: heuristics, vector-file I/O, tracing."""

import logging

import numpy as np
import pytest

from vector_indexer_tpu.utils import (
    calculate_max_iterations,
    calculate_num_clusters,
    generate_test_vectors,
    mini_batch_size,
    read_vectors_from_file,
    suggest_nlist,
    write_vectors_to_file,
)
from vector_indexer_tpu.utils.io import read_vectors_from_file_arrays
from vector_indexer_tpu.utils.tracing import phase_report, reset_phases, trace


def test_cluster_heuristics():
    # Parity values from /root/reference/src/utils.rs:9-16.
    assert calculate_num_clusters(9_999) == 99
    assert calculate_num_clusters(10_000) == 200
    assert calculate_num_clusters(99_999) == 2 * 317
    assert calculate_num_clusters(1_000_000) == 4_000
    assert suggest_nlist(500_000) == 4 * int(np.ceil(np.sqrt(500_000)))


def test_iteration_heuristics():
    assert calculate_max_iterations(5_000) == 300
    assert calculate_max_iterations(50_000) == 100
    assert calculate_max_iterations(500_000) == 50
    assert calculate_max_iterations(5_000_000) == 20


def test_mini_batch_size_clamp():
    assert mini_batch_size(25) == 10
    assert mini_batch_size(10_000) == 100
    assert mini_batch_size(10_000_000) == 256


def test_vector_file_roundtrip(tmp_path):
    f = str(tmp_path / "v.bin")
    ids = np.arange(123, dtype=np.uint64) + 500
    vecs = np.random.default_rng(0).normal(size=(123, 9)).astype(np.float32)
    ts = np.arange(123, dtype=np.uint64) + 1
    write_vectors_to_file(f, ids, vecs, ts, batch_size=50)
    rid, rts, rvec = read_vectors_from_file_arrays(f)
    np.testing.assert_array_equal(rid, ids)
    np.testing.assert_array_equal(rts, ts)
    np.testing.assert_array_equal(rvec, vecs)


def test_vector_file_truncated_tail(tmp_path):
    f = str(tmp_path / "v.bin")
    generate_test_vectors(f, 100, 8, seed=3, batch_size=40)
    # Chop mid-batch: reader keeps complete batches, drops the tail.
    raw = open(f, "rb").read()
    open(f, "wb").write(raw[: len(raw) - 37])
    recs = read_vectors_from_file(f)
    assert 40 <= len(recs) < 100


def test_generate_deterministic(tmp_path):
    a, b = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    generate_test_vectors(a, 50, 4, seed=7)
    generate_test_vectors(b, 50, 4, seed=7)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_trace_phases():
    reset_phases()
    with trace("unit.phase"):
        pass
    with trace("unit.phase"):
        pass
    rep = phase_report()
    assert rep["unit.phase"]["count"] == 2
    assert rep["unit.phase"]["total_s"] >= 0


def test_native_io_if_available(tmp_path):
    from vector_indexer_tpu.storage.native import shardio

    if not shardio.available():
        pytest.skip("native toolchain unavailable")
    p = str(tmp_path / "n.bin")
    payload = bytes(range(256)) * 100
    shardio.write_file(p, payload)
    assert shardio.read_file(p) == payload
