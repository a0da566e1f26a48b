"""Host-resident staged serving (unbounded-corpus mode).

TPU twin of the reference's disk-resident selective reads
(/root/reference/src/shards.rs:188-349): the posting layout stays in host
RAM, each batch stages only the probed cells' aligned posting blocks into
device memory, and the masked-dense program sweeps the staged sub-table.
The result set must be exactly the device-resident dense path's (same
tie-inclusive probe rule, same exact scoring).
"""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.index.ivf import load_index_from
from vector_indexer_tpu.storage import VectorStore


def _store(data):
    return VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    wd = tmp_path_factory.mktemp("staged_idx")
    data, _, _ = make_gaussian_clusters(12, 130, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=42)
    idx.save_to(wd / "index", wd / "shards")
    return wd, data


def _load_pair(wd):
    dev = load_index_from(wd / "index", wd / "shards")
    host = load_index_from(wd / "index", wd / "shards", resident="host")
    return dev, host


def test_host_resident_layout_stays_on_host(saved):
    wd, _ = saved
    host = load_index_from(wd / "index", wd / "shards", resident="host")
    assert host.host_resident
    lay = host.layout
    for arr in (lay.vectors, lay.row_norms, lay.offsets, lay.lengths):
        assert isinstance(arr, np.ndarray)


def test_staged_matches_dense_exact(saved):
    wd, data = saved
    dev, host = _load_pair(wd)
    q = data[:64] + 0.02
    for n_probe in (1, 3, 8):
        Dd, Id = dev.search_batch(q, 10, n_probe, method="dense_exact")
        Ds, Is = host.search_batch(q, 10, n_probe)  # auto -> staged
        np.testing.assert_allclose(Dd, Ds, rtol=1e-5, atol=1e-5)
        for a, b in zip(Id, Is):
            assert set(a.tolist()) == set(b.tolist())


def test_staged_explicit_method_and_guards(saved):
    wd, data = saved
    _, host = _load_pair(wd)
    D, I = host.search_batch(data[:8], 5, 4, method="staged")
    assert D.shape == (8, 5) and I.shape == (8, 5)
    with pytest.raises(RuntimeError):
        host.search_batch(data[:8], 5, 4, method="dense")
    with pytest.raises(RuntimeError):
        host.search_batch_device(data[:8], 5, 4)


def test_staged_metric_parity(tmp_path):
    data, _, _ = make_gaussian_clusters(8, 100, 16, spread=0.5, separation=6.0)
    for metric in ("ip", "cosine"):
        idx = IvfIndex.fit(_store(data), seed=42, metric=metric)
        idx.save_to(tmp_path / f"i_{metric}", tmp_path / f"s_{metric}")
        dev = load_index_from(tmp_path / f"i_{metric}", tmp_path / f"s_{metric}")
        host = load_index_from(
            tmp_path / f"i_{metric}", tmp_path / f"s_{metric}", resident="host"
        )
        q = data[:32] * 1.3
        Dd, Id = dev.search_batch(q, 8, 4, method="dense_exact")
        Ds, Is = host.search_batch(q, 8, 4)
        np.testing.assert_allclose(Dd, Ds, rtol=1e-4, atol=5e-4)
        for a, b in zip(Id, Is):
            assert set(a.tolist()) == set(b.tolist())


def test_staged_spill_dedup(tmp_path):
    data, _, _ = make_gaussian_clusters(8, 120, 16, spread=0.6, separation=5.0)
    idx = IvfIndex.fit(_store(data), seed=42, spill=1)
    idx.save_to(tmp_path / "index", tmp_path / "shards")
    dev = load_index_from(tmp_path / "index", tmp_path / "shards")
    host = load_index_from(
        tmp_path / "index", tmp_path / "shards", resident="host"
    )
    assert host.spill == 1
    q = data[:40] + 0.05
    Dd, Id = dev.search_batch(q, 10, 4)
    Ds, Is = host.search_batch(q, 10, 4)
    for row in Is:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)  # no duplicate ids
    # atol 5e-4: the staged buffer tiles differently from the full table,
    # so f32 accumulation noise on near-zero self-distances reaches ~2e-4.
    np.testing.assert_allclose(Dd, Ds, rtol=1e-4, atol=5e-4)


def test_to_host_resident_roundtrip(saved):
    wd, data = saved
    dev, _ = _load_pair(wd)
    q = data[:24] + 0.01
    Dd, Id = dev.search_batch(q, 10, 6, method="dense_exact")
    dev.to_host_resident()
    assert dev.host_resident
    assert isinstance(dev.layout.vectors, np.ndarray)
    Ds, Is = dev.search_batch(q, 10, 6)
    np.testing.assert_allclose(Dd, Ds, rtol=1e-5, atol=1e-5)
    for a, b in zip(Id, Is):
        assert set(a.tolist()) == set(b.tolist())


def test_staged_padding_contract(saved):
    wd, data = saved
    _, host = _load_pair(wd)
    n = host.layout.n
    D, I = host.search_batch(data[:4], n + 7, host.num_clusters)
    assert D.shape == (4, n + 7)
    assert np.all(np.isinf(D[:, n:])) and np.all(I[:, n:] == -1)
    # Real slots: sorted ascending, valid ids.
    for row_d, row_i in zip(D, I):
        real = row_i >= 0
        assert np.all(np.diff(row_d[real]) >= -1e-6)


def test_staged_bytes_grow_with_nprobe(saved):
    wd, data = saved
    _, host = _load_pair(wd)
    q = data[:4]
    host.search_batch(q, 5, 1)
    small = host._last_stage_bytes
    host.search_batch(q, 5, host.num_clusters)
    big = host._last_stage_bytes
    assert small < big
    full_bytes = host.layout.vectors.shape[0] * host.dimension * 4
    assert small < full_bytes / 2  # selective staging actually selective


def test_staged_quantized_dtypes(saved):
    """bf16/int8 staging: 2x/4x smaller h2d payload, exact host re-rank
    restores exact distances (same contract as the int8 offload mode)."""
    import jax.numpy as jnp

    wd, data = saved
    _, host = _load_pair(wd)
    q = data[:32] + 0.02
    De, Ie = host.search_batch(q, 10, 6)  # f32 staging baseline
    host.search_batch(q, 10, 6)
    f32_bytes = host._last_stage_bytes
    for sd, max_bytes in ((jnp.bfloat16, f32_bytes * 0.6),
                          (jnp.int8, f32_bytes * 0.4)):
        host.stage_dtype = sd
        try:
            D, I = host.search_batch(q, 10, 6)
            qbytes = host._last_stage_bytes
        finally:
            host.stage_dtype = jnp.float32
        for a, b in zip(Ie, I):
            assert set(a.tolist()) == set(b.tolist()), sd
        # atol 2e-3: the host re-rank and the device sweep accumulate the
        # same f32 sums in different orders.
        np.testing.assert_allclose(De, D, rtol=1e-4, atol=2e-3)
        assert qbytes <= max_bytes, (sd, qbytes, f32_bytes)


def test_staged_quantized_spill(tmp_path):
    data, _, _ = make_gaussian_clusters(8, 120, 16, spread=0.6, separation=5.0)
    import jax.numpy as jnp

    idx = IvfIndex.fit(_store(data), seed=42, spill=1)
    idx.save_to(tmp_path / "index", tmp_path / "shards")
    host = load_index_from(
        tmp_path / "index", tmp_path / "shards", resident="host"
    )
    host.stage_dtype = jnp.int8
    D, I = host.search_batch(data[:24] + 0.05, 10, 4)
    for row in I:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    dev = load_index_from(tmp_path / "index", tmp_path / "shards")
    Dd, Id = dev.search_batch(data[:24] + 0.05, 10, 4)
    np.testing.assert_allclose(Dd, D, rtol=1e-4, atol=5e-4)


def test_host_resident_rejects_offload(saved):
    wd, _ = saved
    _, host = _load_pair(wd)
    with pytest.raises(RuntimeError):
        host.offload_main_table()


def test_staged_single_query_convenience(saved):
    wd, data = saved
    _, host = _load_pair(wd)
    hits = host.search(data[7], 5, 4)
    assert hits and hits[0][0] == 7 and hits[0][1] < 1e-3


def test_fit_host_resident_low_hbm(tmp_path):
    """fit(resident='host') — the low-HBM build: the corpus is never
    fully staged (training sample + fixed assignment chunks only), the
    layout packs host-side, and the result serves/saves/reloads exactly
    like a device build downgraded to host residency. Centroids and
    result sets must MATCH the device fit with the same train_sample
    (same seeded subsample, same exact chunked assignment)."""
    data, _, _ = make_gaussian_clusters(4000, 24, 12, spread=0.4,
                                        separation=8.0)
    store = _store(data)
    # (Multi-chunk + tail-padding coverage lives in
    # test_assign_points_host_chunked_tail_padding; this fit's n=4000
    # fits one default chunk.)
    hidx = IvfIndex.fit(store, seed=42, resident="host", train_sample=1500)
    assert hidx.host_resident
    assert isinstance(hidx.layout.vectors, np.ndarray)
    didx = IvfIndex.fit(store, seed=42, train_sample=1500)
    np.testing.assert_allclose(
        hidx.centroids, didx.centroids, rtol=1e-5, atol=1e-5
    )
    q = data[:16] + 0.01
    Dh, Ih = hidx.search_batch(q, 5, 6)
    Dd, Id = didx.search_batch(q, 5, 6)
    for a, b in zip(Ih, Id):
        assert set(a.tolist()) == set(b.tolist())
    # persistence roundtrip keeps working from the host mirror
    from vector_indexer_tpu.storage.persist import save_index, load_index

    save_index(hidx, tmp_path / "index", tmp_path / "shards")
    ridx = load_index(tmp_path / "index", tmp_path / "shards",
                      resident="host")
    Dr, Ir = ridx.search_batch(q, 5, 6)
    for a, b in zip(Ih, Ir):
        assert set(a.tolist()) == set(b.tolist())
    # invalid combos are rejected
    with pytest.raises(ValueError):
        IvfIndex.fit(store, seed=42, resident="host", spill=1)
    with pytest.raises(ValueError):
        IvfIndex.fit(store, seed=42, resident="nope")


def test_assign_points_host_chunked_tail_padding():
    """Chunked host assignment: labels identical to the one-shot device
    assignment, including a non-multiple tail chunk (zero-padded rows
    must not leak into the output)."""
    from vector_indexer_tpu.models.kmeans import (
        assign_points,
        assign_points_host_chunked,
    )

    data, _, _ = make_gaussian_clusters(1030, 16, 7, spread=0.5,
                                        separation=6.0)
    cent = data[:7].copy()
    ref, _ = assign_points(data, cent)
    got = assign_points_host_chunked(data, cent, chunk_rows=256)
    np.testing.assert_array_equal(np.asarray(ref), got)
