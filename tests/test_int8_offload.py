"""int8 stream tables + larger-than-HBM offload mode.

The reference's core design point is an index bigger than RAM served by
selective disk reads (/root/reference/src/shards.rs:188-349). The TPU twin:
``offload_main_table`` frees the f32 HBM table, keeps an int8 per-cluster-
scaled residual stream table for the device sweep (4x less HBM than f32),
and re-ranks the widened shortlist exactly on the host from the index's
host mirror.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore


def _store(data):
    return VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )


@pytest.fixture(scope="module")
def built():
    data, _, _ = make_gaussian_clusters(10, 150, 24, spread=0.4, separation=8.0)
    return IvfIndex.fit(_store(data), seed=42), data


def test_int8_stream_matches_exact_sets(built):
    idx, data = built
    idx.stream_dtype = jnp.int8
    try:
        q = data[:48] + 0.01
        Dg, Ig = idx.search_batch(q, 10, 8, method="gather")
        Ds, Is = idx.search_batch(q, 10, 8, method="stream")
        for a, b in zip(Ig, Is):
            assert set(a.tolist()) == set(b.tolist())
        # int8 selection + exact f32 re-rank: distances exact.
        np.testing.assert_allclose(Dg, Ds, rtol=1e-4, atol=1e-4)
    finally:
        idx.stream_dtype = jnp.bfloat16


def test_int8_table_quantization_bounds(built):
    from vector_indexer_tpu.ops.pallas.block_stream import build_stream_table

    idx, data = built
    st = build_stream_table(idx.layout, idx.centroids, jnp.int8)
    assert st.vecs.dtype == jnp.int8
    assert st.scales.shape == (idx.num_clusters,)
    # Dequantized residual error bounded by s_c/2 per component.
    v = np.asarray(st.vecs, np.int32)
    assert v.max() <= 127 and v.min() >= -127


def test_int8_shared_kernel(built):
    # The block-major shared kernel carries the int8 dequant scale in its
    # prefetch; result sets must match the exact path after re-rank.
    idx, data = built
    idx.stream_dtype = jnp.int8
    try:
        q = data[:16] + 0.01
        Dg, Ig = idx.search_batch(q, 5, 4, method="gather")
        D, I = idx.search_batch(q, 5, 4, method="stream_shared")
        for a, b in zip(Ig, I):
            assert set(a.tolist()) == set(b.tolist())
        assert (I[:, 0] == np.arange(16)).all()
    finally:
        idx.stream_dtype = jnp.bfloat16


def test_offload_mode_end_to_end():
    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:32] + 0.01
    D_ref, I_ref = idx.search_batch(q, 10, idx.num_clusters, method="gather")

    idx.offload_main_table()  # int8 default
    assert idx.offloaded and idx.layout.vectors is None
    D, I = idx.search_batch(q, 10, idx.num_clusters)
    for a, b in zip(I_ref, I):
        assert set(a.tolist()) == set(b.tolist())
    # Host re-rank returns exact f32 distances (reduction-order noise only).
    np.testing.assert_allclose(np.sort(D_ref, 1), np.sort(D, 1), rtol=1e-3,
                               atol=1e-3)


def test_offload_device_ranked_mode():
    # rerank='none': device-throughput serving; distances carry int8
    # quantization error but the result SET matches the exact oracle on
    # well-separated data.
    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:24] + 0.01
    D_ref, I_ref = idx.search_batch(q, 10, idx.num_clusters, method="gather")
    idx.offload_main_table(rerank="none")
    D, I = idx.search_batch(q, 10, idx.num_clusters)
    for a, b in zip(I_ref, I):
        assert set(a.tolist()) == set(b.tolist())
    # Quantized distances approximate the exact ones.
    np.testing.assert_allclose(np.sort(D_ref, 1), np.sort(D, 1), rtol=0.05,
                               atol=0.05)


def test_offload_bad_rerank_mode():
    data, _, _ = make_gaussian_clusters(4, 80, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=1)
    with pytest.raises(ValueError, match="rerank"):
        idx.offload_main_table(rerank="gpu")


def test_offload_rejects_non_stream_methods():
    data, _, _ = make_gaussian_clusters(6, 100, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=3)
    idx.offload_main_table()
    with pytest.raises(RuntimeError, match="stream"):
        idx.search_batch_device(data[:4], 5, 2, method="dense")
    # 'auto' resolves to stream and works.
    D, I = idx.search_batch(data[:8], 5, idx.num_clusters, method="auto")
    assert (I[:, 0] == np.arange(8)).all()


def test_offload_with_spill_dedups():
    data, _, _ = make_gaussian_clusters(6, 120, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=5, spill=1)
    idx.offload_main_table()
    D, I = idx.search_batch(data[:16], 10, idx.num_clusters)
    for row in I:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    assert (I[:, 0] == np.arange(16)).all()

def test_host_built_stream_table_matches_device_build():
    # build_stream_table_host (load resident='offload') must reproduce the
    # device builder's table: identical int8 codes and maps, norms/scales
    # equal up to f32 summation order.
    from vector_indexer_tpu.ops.pallas.block_stream import (
        build_stream_table,
        build_stream_table_host,
    )
    from vector_indexer_tpu.storage.layout import PostingLayout

    data, _, _ = make_gaussian_clusters(8, 130, 24, spread=0.5, separation=6.0)
    idx = IvfIndex.fit(_store(data), seed=11)
    dev = build_stream_table(idx.layout, idx.centroids, jnp.int8)
    lay = idx.layout
    host_lay = PostingLayout(
        vectors=np.asarray(lay.vectors),
        row_norms=np.asarray(lay.row_norms),
        offsets=np.asarray(lay.offsets),
        lengths=np.asarray(lay.lengths),
        perm=lay.perm,
        n=lay.n,
        max_list_len=lay.max_list_len,
    )
    hst = build_stream_table_host(host_lay, idx.centroids, jnp.int8)
    assert hst.m_pad == dev.m_pad and hst.chunk == dev.chunk
    np.testing.assert_allclose(
        np.asarray(hst.scales), np.asarray(dev.scales), rtol=1e-6
    )
    # Codes may differ only where round(r/s) sits exactly between ints.
    mismatch = np.asarray(hst.vecs, np.int32) - np.asarray(dev.vecs, np.int32)
    assert np.abs(mismatch).max() <= 1
    assert (mismatch != 0).mean() < 1e-3
    np.testing.assert_allclose(
        np.asarray(hst.norms), np.asarray(dev.norms), rtol=1e-4, atol=1e-4
    )
    for f in ("to_main", "sblk0", "lengths", "blk_cid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hst, f)), np.asarray(getattr(dev, f))
        )


def test_load_resident_offload_end_to_end(tmp_path):
    # The larger-than-HBM LOAD path: the f32 table never touches the
    # device; searches match the device-offloaded index's results.
    from vector_indexer_tpu.index import load_index_from

    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:32] + 0.01
    D_ref, I_ref = idx.search_batch(q, 10, idx.num_clusters, method="gather")
    idx.save_shards_to(tmp_path / "shards")
    idx.save_to(tmp_path / "index")

    off = load_index_from(tmp_path / "index", tmp_path / "shards",
                          resident="offload")
    assert off.offloaded and not off.host_resident
    assert off.layout.vectors is None and off.layout.row_norms is None
    assert off.stream_dtype == jnp.int8
    D, I = off.search_batch(q, 10, off.num_clusters)
    for a, b in zip(I_ref, I):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(D_ref, 1), np.sort(D, 1),
                               rtol=1e-3, atol=1e-3)
    # Non-stream methods stay rejected, like device-side offload.
    with pytest.raises(RuntimeError, match="stream"):
        off.search_batch_device(q[:4], 5, 2, method="dense")


def test_offload_from_host_rejects_device_layout():
    data, _, _ = make_gaussian_clusters(4, 80, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=1)
    with pytest.raises(RuntimeError, match="device-resident"):
        idx.offload_from_host()


def test_offload_serves_stream_shared(monkeypatch):
    """The 'auto' gate can upgrade offloaded serving to the block-major
    shared kernel at huge probed footprints (choose_method). Force the
    gate open (tiny thresholds) and check BOTH rerank modes produce the
    per-query kernel's result sets through the auto path."""
    import vector_indexer_tpu.index.dispatch as dispatch_mod

    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:16] + 0.01
    idx.offload_main_table()  # rerank='host'
    Ds, Is = idx.search_batch(q, 8, idx.num_clusters, method="stream")

    # shared_gate reads the dispatch module's globals (ivf re-exports them
    # read-only), so the gate is forced open THERE.
    monkeypatch.setattr(dispatch_mod, "SHARED_MIN_NQ", 1)
    monkeypatch.setattr(dispatch_mod, "SHARED_MIN_PROBED_ROWS", 1)
    assert idx.choose_method(len(q), idx.num_clusters) == "stream_shared"
    Dh, Ih = idx.search_batch(q, 8, idx.num_clusters)  # auto -> shared
    for a, b in zip(Is, Ih):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(Ds, 1), np.sort(Dh, 1),
                               rtol=1e-3, atol=1e-3)

    # Device-ranked mode returns the raw width-k plane where shared's
    # selection is measurably lossier — auto must stay on the per-query
    # kernel there even with the gate open.
    idx._offload_rerank = "none"
    assert idx.choose_method(len(q), idx.num_clusters) == "stream"
    Dn, In = idx.search_batch(q, 8, idx.num_clusters)
    for a, b in zip(Is, In):
        assert set(a.tolist()) == set(b.tolist())


def test_offload_auto_single_query_dispatches_nq1(monkeypatch):
    """A single (d,) query through the offloaded auto dispatch must reach
    choose_method as nq=1, not nq=d (regression: the raw dim leaked in as
    the batch size, so any d >= SHARED_MIN_NQ mis-picked the shared
    kernel for a one-query call)."""
    import vector_indexer_tpu.index.dispatch as dispatch_mod

    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4,
                                        separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    idx.offload_main_table(rerank="none")  # direct device dispatch path

    # Gate tuned so the old bug would flip it: d=24 passes nq>=4, a real
    # single query must not.
    monkeypatch.setattr(dispatch_mod, "SHARED_MIN_NQ", 4)
    monkeypatch.setattr(dispatch_mod, "SHARED_MIN_PROBED_ROWS", 1)
    seen = []
    orig = idx.choose_method
    monkeypatch.setattr(
        idx, "choose_method",
        lambda nq, p: (seen.append(nq), orig(nq, p))[1],
    )
    D, I = idx.search_batch(data[0] + 0.01, 5, idx.num_clusters)
    assert seen == [1]
    assert I.shape[-1] == 5 and int(I.ravel()[0]) >= 0


# --- rerank='device': two-layer corrected re-rank (ops/correction.py) ---


def test_offload_device_rerank_end_to_end():
    # rerank='device': results match the exact-host re-rank's SET and the
    # corrected distances land ~2 orders closer to exact f32 than the
    # rank-only int8 mode (14 effective bits vs 7).
    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:32] + 0.01
    D_ref, I_ref = idx.search_batch(q, 10, idx.num_clusters, method="gather")
    idx.offload_main_table(rerank="device")
    assert idx.offloaded and idx._corr_table is not None
    D, I = idx.search_batch(q, 10, idx.num_clusters)
    for a, b in zip(I_ref, I):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(D_ref, 1), np.sort(D, 1),
                               rtol=2e-3, atol=2e-3)


def test_offload_device_rerank_distance_accuracy():
    # The two-layer reconstruction must cut the int8-only distance error
    # by >=10x at matched ids (s2 ~ s1/127 per component).
    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.5, separation=6.0)
    q = data[:24] + 0.05

    idx_n = IvfIndex.fit(_store(data), seed=7)
    D_ref, I_ref = idx_n.search_batch(q, 10, idx_n.num_clusters,
                                      method="gather")
    idx_n.offload_main_table(rerank="none")
    D_n, I_n = idx_n.search_batch(q, 10, idx_n.num_clusters)

    idx_d = IvfIndex.fit(_store(data), seed=7)
    idx_d.offload_main_table(rerank="device")
    D_d, I_d = idx_d.search_batch(q, 10, idx_d.num_clusters)

    def err_sum(D, I):
        tot, cnt = 0.0, 0
        for i in range(len(q)):
            ref = {int(e): float(d) for e, d in zip(I_ref[i], D_ref[i])}
            for e, d in zip(I[i], D[i]):
                if int(e) in ref:
                    tot += abs(d - ref[int(e)])
                    cnt += 1
        return tot / max(cnt, 1)

    e_none, e_dev = err_sum(D_n, I_n), err_sum(D_d, I_d)
    assert e_dev * 10 < max(e_none, 1e-9), (e_dev, e_none)


def test_offload_device_rerank_spill_dedups():
    data, _, _ = make_gaussian_clusters(6, 120, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=5, spill=1)
    idx.offload_main_table(rerank="device")
    D, I = idx.search_batch(data[:16], 10, idx.num_clusters)
    for row in I:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    assert (I[:, 0] == np.arange(16)).all()
    # Distances sorted ascending with +inf padding last.
    assert (np.diff(np.where(np.isfinite(D), D, np.inf), axis=1) >= -1e-6).all()


def test_offload_device_rerank_cosine():
    data, _, _ = make_gaussian_clusters(6, 120, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=3, metric="cosine")
    q = data[:16] + 0.01
    _, I_ref = idx.search_batch(q, 5, idx.num_clusters, method="gather")
    idx.offload_main_table(rerank="device")
    _, I = idx.search_batch(q, 5, idx.num_clusters)
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(I_ref, I))
    assert hits >= 0.95 * I_ref.size


def test_offload_from_host_device_rerank(tmp_path):
    # Host-built correction table (load resident='offload',
    # offload_rerank='device'): f32 corpus never staged; results match the
    # device-offloaded rerank='device' index.
    from vector_indexer_tpu.index import load_index_from

    data, _, _ = make_gaussian_clusters(8, 150, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=7)
    q = data[:32] + 0.01
    D_ref, I_ref = idx.search_batch(q, 10, idx.num_clusters, method="gather")
    idx.save_shards_to(tmp_path / "shards")
    idx.save_to(tmp_path / "index")

    off = load_index_from(tmp_path / "index", tmp_path / "shards",
                          resident="offload", offload_rerank="device")
    assert off.offloaded and off._corr_table is not None
    assert off.layout.vectors is None
    D, I = off.search_batch(q, 10, off.num_clusters)
    for a, b in zip(I_ref, I):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(D_ref, 1), np.sort(D, 1),
                               rtol=2e-3, atol=2e-3)


def test_correction_table_host_matches_device_build():
    # The host builder must reproduce the device builder's q2/scales/norms
    # (same formulas; f32 summation order may differ in norms).
    from vector_indexer_tpu.ops.correction import (
        build_correction_table,
        build_correction_table_host,
    )
    from vector_indexer_tpu.ops.pallas.block_stream import build_stream_table

    data, _, _ = make_gaussian_clusters(6, 120, 16, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=5)
    st = build_stream_table(idx.layout, idx.centroids, jnp.int8)
    dev = build_correction_table(idx.layout, st)

    class HostLay:
        pass

    hl = HostLay()
    hl.offsets = np.asarray(idx.layout.offsets)
    hl.lengths = np.asarray(idx.layout.lengths)
    hl.vectors = np.asarray(idx.layout.vectors)
    hl.dim = idx.layout.dim
    host = build_correction_table_host(hl, st)
    np.testing.assert_allclose(np.asarray(dev.scales2),
                               np.asarray(host.scales2), rtol=1e-6)
    assert (np.asarray(dev.q2) == np.asarray(host.q2)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(dev.norms_abs),
                               np.asarray(host.norms_abs), rtol=1e-4)
    assert (np.asarray(dev.inv) == np.asarray(host.inv)).all()
