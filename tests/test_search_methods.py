"""Cross-validation of the three batched search paths (gather / dense /
dense_fast): identical or near-identical result sets, exact distances."""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore


@pytest.fixture(scope="module")
def built():
    data, _, _ = make_gaussian_clusters(10, 150, 24, spread=0.4, separation=8.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    return IvfIndex.fit(store, seed=42), data


def _run(idx, q, method, n_probe=8):
    D, I = idx.search_batch(q, k=10, n_probe=n_probe, method=method)
    return D, I


def test_gather_vs_dense_identical_sets(built):
    idx, data = built
    q = data[:64]
    Dg, Ig = _run(idx, q, "gather")
    Dd, Id = _run(idx, q, "dense")
    np.testing.assert_allclose(Dg, Dd, rtol=1e-3, atol=5e-4)
    for a, b in zip(Ig, Id):
        assert set(a.tolist()) == set(b.tolist())


def test_dense_exact_matches_dense_small_n(built):
    # Below the approx-selection threshold 'dense' and 'dense_exact' are the
    # same program; both must agree with gather.
    idx, data = built
    q = data[:64]
    Dd, Id = _run(idx, q, "dense")
    De, Ie = _run(idx, q, "dense_exact")
    np.testing.assert_array_equal(Id, Ie)
    np.testing.assert_allclose(Dd, De)


def test_dense_self_hit(built):
    idx, data = built
    D, I = _run(idx, data[:16], "dense")
    assert (I[:, 0] == np.arange(16)).all()
    assert (D[:, 0] < 1e-3).all()


def test_fused_methods_fall_back_on_cpu(built):
    """'flat_fused'/'dense_fused' must degrade to their XLA twins on the
    CPU backend (the Pallas kernel only runs compiled on TPU) — same
    results, no error."""
    idx, data = built
    q = data[:32]
    Dd, Id = _run(idx, q, "dense")
    Df, If = _run(idx, q, "dense_fused")
    np.testing.assert_array_equal(Id, If)
    np.testing.assert_allclose(Dd, Df)
    D1, I1 = _run(idx, q, "flat")
    D2, I2 = _run(idx, q, "flat_fused")
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2)


def test_unknown_method_errors(built):
    idx, data = built
    with pytest.raises(ValueError, match="unknown search method"):
        idx.search_batch(data[:2], k=1, n_probe=1, method="nope")


def test_stream_exact_matches_gather(built):
    # Block-stream kernel, f32 table, worst-case slots: identical id sets.
    idx, data = built
    q = data[:64]
    Dg, Ig = _run(idx, q, "gather")
    Ds, Is = _run(idx, q, "stream_exact")
    for a, b in zip(Ig, Is):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(Dg, 1), np.sort(Ds, 1), rtol=1e-3, atol=1e-3)


def test_stream_bf16_residual_recall(built, monkeypatch):
    # bf16 residual sweep + exact f32 re-rank FORCED ON: ids match the
    # exact path and distances are the re-ranked ones. (The no-re-rank
    # default's quantized-exact contract: test_fused_stream.py.)
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    q = data[:64] + 0.01
    Dg, Ig = _run(idx, q, "gather")
    Ds, Is = _run(idx, q, "stream")
    for a, b in zip(Ig, Is):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(Dg, Ds, rtol=1e-4, atol=1e-4)


def test_stream_truncation_drops_farthest_first(built):
    # With a tiny forced slot budget the nearest probed lists must survive:
    # the self-hit (in the nearest cell) is never the candidate dropped.
    # (FAN is patched down so the forced t_fixed=8 stays a FAN multiple.)
    from unittest import mock

    from vector_indexer_tpu.ops.pallas import block_stream as bs

    idx, data = built
    with mock.patch.object(bs, "FAN", 4), mock.patch(
        "vector_indexer_tpu.ops.pallas.block_stream.per_query_slots",
        return_value=8,
    ):
        D, I = _run(idx, data[:16], "stream", n_probe=10)  # 10 tasks > 8 slots
    assert (I[:, 0] == np.arange(16)).all()


def test_stream_metrics(built, monkeypatch):
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    for metric in ("ip", "cosine"):
        m = IvfIndex.fit(store, seed=42, metric=metric)
        q = data[:32]
        Dg, Ig = m.search_batch(q, k=10, n_probe=8, method="gather")
        Ds, Is = m.search_batch(q, k=10, n_probe=8, method="stream")
        for a, b in zip(Ig, Is):
            assert set(a.tolist()) == set(b.tolist()), metric
        np.testing.assert_allclose(Dg, Ds, rtol=1e-4, atol=1e-4)


def test_stream_k_exceeds_candidates(built):
    idx, data = built
    D, I = idx.search_batch(data[:4], k=500, n_probe=1, method="stream")
    assert D.shape == (4, 500)
    pad = I < 0
    assert pad.any(), "n_probe=1 cannot fill k=500 on this fixture"
    assert np.isinf(D[pad]).all()


def test_gather_dma_matches_gather(built):
    # Range-DMA Pallas kernel path (interpret mode on CPU). NOTE: this
    # fixture is d=24, so the dispatch exercises the documented
    # lane-alignment FALLBACK to the XLA gather; the kernel itself is
    # covered at d=128 below and in test_pallas_ivf_gather.py.
    idx, data = built
    Dg, Ig = _run(idx, data[:8], "gather")
    Dd, Id = _run(idx, data[:8], "gather_dma")
    for a, b in zip(Ig, Id):
        assert set(a.tolist()) == set(b.tolist())
    # f32 reduction-order noise between the kernel's matvec and the XLA
    # einsum; self-hit distances are ~1e-4-scale so compare absolutely.
    np.testing.assert_allclose(np.sort(Dg, 1), np.sort(Dd, 1), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_gather_dma_kernel_all_metrics_d128(metric):
    """The range-DMA kernel engages (d=128 passes the lane gate) for every
    metric and matches the XLA gather's result sets."""
    data, _, _ = make_gaussian_clusters(
        8, 90, 128, spread=0.4, separation=8.0
    )
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=42, metric=metric)
    q = data[:12] + 0.01
    Dg, Ig = idx.search_batch(q, k=8, n_probe=4, method="gather")
    Dd, Id = idx.search_batch(q, k=8, n_probe=4, method="gather_dma")
    for a, b in zip(Ig, Id):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(
        np.sort(Dg, 1), np.sort(Dd, 1), rtol=1e-3, atol=1e-3
    )


def test_stream_shared_exact_matches_gather(built):
    # Block-major shared kernel, f32 table, worst-case task budget:
    # identical id sets and near-identical distances.
    idx, data = built
    q = data[:64]
    Dg, Ig = _run(idx, q, "gather")
    Ds, Is = _run(idx, q, "stream_shared_exact")
    for a, b in zip(Ig, Is):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(Dg, 1), np.sort(Ds, 1), rtol=1e-3, atol=1e-3)


def test_stream_shared_bf16_matches_exact(built, monkeypatch):
    # Shared kernel, bf16 residual table + exact f32 re-rank forced on
    # (the no-re-rank default's looser contract is covered in
    # test_fused_stream.py).
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    q = data[:48] + 0.01
    Dg, Ig = _run(idx, q, "gather")
    Ds, Is = _run(idx, q, "stream_shared")
    for a, b in zip(Ig, Is):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(Dg, Ds, rtol=1e-4, atol=1e-4)


def test_stream_shared_task_drop_graceful(built):
    # A forced tiny task cap drops whole tasks; surviving slots must still
    # produce valid (never wrong) results and self-hits for intact queries
    # degrade gracefully: every returned id is a real neighbor id.
    idx, data = built
    q = data[:32]
    D, I = idx.search_batch(q, k=5, n_probe=4, method="stream_shared")
    assert ((I >= 0) | np.isinf(D)).all()
    assert (I[:, 0] == np.arange(32)).all()


def test_stream_shared_metrics(built, monkeypatch):
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx, data = built
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    for metric in ("ip", "cosine"):
        m = IvfIndex.fit(store, seed=1, metric=metric)
        D, I = m.search_batch(data[:16], k=5, n_probe=m.num_clusters,
                              method="stream_shared")
        De, Ie = m.search_batch(data[:16], k=5, n_probe=m.num_clusters,
                                method="gather")
        for a, b in zip(I, Ie):
            assert set(a.tolist()) == set(b.tolist()), metric


def test_stream_shared_tiny_batch_many_blocks():
    """Regression: a tiny query batch against a many-block table used to
    blow the worst-case task bound past npairs (argsort under-slice ->
    shape mismatch). Tasks can never exceed the pair count."""
    from conftest import make_gaussian_clusters

    data, _, _ = make_gaussian_clusters(80, 40, 16, spread=0.4, separation=8.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=9)
    q = data[:8]
    D, I = idx.search_batch(q, k=5, n_probe=8, method="stream_shared_exact")
    De, Ie = idx.search_batch(q, k=5, n_probe=8, method="gather")
    for a, b in zip(I, Ie):
        assert set(a.tolist()) == set(b.tolist())


def test_dense_approx_branch_exact_distances():
    """n > 50k switches 'dense'/'flat' onto the approx branch (bf16-input
    sweep + approx_min_k + exact f32 re-rank). The returned distances must
    be exact f32 — equal to the brute-force oracle for the ids returned —
    and the self-hit must survive the approximate selection."""
    g = np.random.default_rng(3)
    n, d = 50_200, 8
    data = g.normal(0, 1, (n, d)).astype(np.float32)
    idx = IvfIndex.fit(
        VectorStore(external_ids=np.arange(n, dtype=np.uint64), vectors=data),
        seed=3, nlist=64, max_iters=4,
    )
    q = data[:8]
    for method in ("dense", "flat"):
        D, I = idx.search_batch(q, k=10, n_probe=16, method=method)
        assert (I[:, 0] == np.arange(8)).all(), method
        ok = I >= 0
        expect = ((q[:, None, :] - data[np.maximum(I, 0)]) ** 2).sum(-1)
        np.testing.assert_allclose(D[ok], expect[ok], rtol=1e-4, atol=1e-4)


def test_stream_bf16_whale_cluster_shortlist():
    """Regression: when k-means leaves high-spread (whale) clusters, bf16
    residual distance error scales with the spread and a narrow re-rank
    shortlist dropped true neighbors (found at d=64, 80 true centers vs
    nlist=113 — mixed clusters with |residual| ~ 50). The widened shortlist
    floor must recover the exact result set."""
    d = 64
    g = np.random.default_rng(9)
    centers = g.normal(0, 8, (80, d)).astype(np.float32)
    data = (centers[g.integers(0, 80, 3200)] + g.normal(0, 0.4, (3200, d))).astype(
        np.float32
    )
    idx = IvfIndex.fit(
        VectorStore(external_ids=np.arange(3200, dtype=np.uint64), vectors=data),
        seed=9,
    )
    for method in ("stream", "stream_shared"):
        D, I = idx.search_batch(data[:8], 5, 8, method=method)
        De, Ie = idx.search_batch(data[:8], 5, 8, method="gather")
        for a, b in zip(I, Ie):
            assert set(a.tolist()) == set(b.tolist()), method


def test_stream_rerank_placement_parity(built):
    """Hoisted (super-tile) vs per-tile exact re-rank return identical
    result sets and distances: the placement is a scheduling choice, not
    a semantic one (round-5; VITPU_HOISTED_RERANK)."""
    import vector_indexer_tpu.index.ivf as ivfmod

    idx, data = built
    q = data[:64] + 0.05
    orig = ivfmod._HOISTED_RERANK
    try:
        ivfmod._HOISTED_RERANK = True
        ivfmod._ivf_search_stream_program.clear_cache()
        Dh, Ih = _run(idx, q, "stream")
        ivfmod._HOISTED_RERANK = False
        ivfmod._ivf_search_stream_program.clear_cache()
        Dp, Ip = _run(idx, q, "stream")
    finally:
        ivfmod._HOISTED_RERANK = orig
        ivfmod._ivf_search_stream_program.clear_cache()
    np.testing.assert_array_equal(Ih, Ip)
    np.testing.assert_allclose(Dh, Dp, rtol=1e-6, atol=1e-5)
