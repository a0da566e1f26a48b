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
