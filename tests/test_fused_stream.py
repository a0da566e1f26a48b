"""Fused-selection block-stream kernel: parity vs the materialized-plane
path (interpret mode).

The fused variant keeps per-(group, lane) (best, second) accumulator
planes in the query's VMEM-resident output block instead of materializing
the full (nq, t_fixed*CHUNK) distance plane to HBM (the ~11 ms/kilobatch
selection regime the flat_sweep kernel already escapes — see
ops/pallas/flat_sweep.py module docstring). Contract under test:

* the per-lane minimum always survives -> top-1 EXACTLY matches the
  unfused path (same distances);
* the top-2-per-lane tail loss at k << G*CHUNK lanes is negligible on
  these fixtures -> full result-set intersection ~1.0;
* inf/-1 padding, unused-slot masking, int8 dequant, and all metrics
  behave identically to the unfused kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.ops.pallas.block_stream import (
    block_stream_search,
    per_query_slots,
    pick_stream_groups,
)
from vector_indexer_tpu.storage import VectorStore


@pytest.fixture(scope="module")
def built():
    data, _, _ = make_gaussian_clusters(
        16, 400, 32, spread=0.4, separation=8.0, seed=7
    )
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    return store, data


def _probe(queries, table, n_probe):
    cent = jnp.asarray(table.cent)
    q = jnp.asarray(queries)
    d2 = (
        jnp.sum(q * q, 1)[:, None]
        - 2.0 * q @ cent.T
        + jnp.sum(cent * cent, 1)[None, :]
    )
    _, probe = jax.lax.top_k(-d2, n_probe)
    return probe


def _both(core, queries, n_probe, k, metric):
    table = core._stream_table(core.stream_dtype)
    lay = core.layout
    t_fixed = per_query_slots(
        np.asarray(lay.lengths), n_probe, chunk=table.chunk
    )
    q = jnp.asarray(queries)
    if metric == "cosine":
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    probe = _probe(q, table, n_probe)
    kw = dict(t_fixed=t_fixed, metric=metric, approx=False, interpret=True)
    Du, Iu = block_stream_search(q, table, probe, k, fused=False, **kw)
    Df, If = block_stream_search(q, table, probe, k, fused=True, **kw)
    return map(np.asarray, (Du, Iu, Df, If))


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_fused_matches_unfused(built, metric):
    store, data = built
    idx = IvfIndex.fit(store, seed=42, metric=metric)
    Du, Iu, Df, If = _both(idx, data[:24] + 0.01, n_probe=4, k=40, metric=metric)
    # per-lane min always survives: exact top-1 rows and distances
    np.testing.assert_array_equal(Iu[:, 0], If[:, 0])
    np.testing.assert_allclose(Du[:, 0], Df[:, 0], rtol=1e-5, atol=1e-5)
    inter = np.mean(
        [
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            / max((a >= 0).sum(), 1)
            for a, b in zip(Iu, If)
        ]
    )
    assert inter >= 0.99, f"{metric}: intersection {inter}"


def test_fused_int8_table(built):
    store, data = built
    idx = IvfIndex.fit(store, seed=42)
    idx.stream_dtype = jnp.dtype(jnp.int8)
    try:
        Du, Iu, Df, If = _both(idx, data[:16] + 0.01, n_probe=4, k=32,
                               metric="l2")
    finally:
        idx.stream_dtype = jnp.bfloat16
    np.testing.assert_array_equal(Iu[:, 0], If[:, 0])
    np.testing.assert_allclose(Du, Df, rtol=1e-3, atol=1e-3)
    inter = np.mean(
        [
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / 32
            for a, b in zip(Iu, If)
        ]
    )
    assert inter >= 0.99


def test_fused_padding_contract(built):
    """k exceeding the probed candidate count: same inf/-1 padding as the
    unfused path (unused slots nval=0-masked in-kernel, never selected)."""
    store, data = built
    idx = IvfIndex.fit(store, seed=42)
    Du, Iu, Df, If = _both(idx, data[:4], n_probe=1, k=500, metric="l2")
    pad_u, pad_f = Iu < 0, If < 0
    assert pad_f.any(), "n_probe=1 should not fill k=500 here"
    np.testing.assert_array_equal(pad_u, pad_f)
    assert np.isinf(Df[pad_f]).all()
    # real candidates agree set-wise per query
    for a, b in zip(Iu, If):
        assert set(a[a >= 0].tolist()) == set(b[b >= 0].tolist())


def test_fused_through_search_batch(built, monkeypatch):
    """VITPU_FUSED_STREAM=1 forces the fused path through the public
    method='stream' program; with the exact f32 re-rank forced on
    (VITPU_STREAM_RERANK=1) result sets match method='gather' exactly."""
    store, data = built
    monkeypatch.setenv("VITPU_FUSED_STREAM", "1")
    monkeypatch.setenv("VITPU_STREAM_RERANK", "1")
    idx = IvfIndex.fit(store, seed=42)
    q = data[:16] + 0.01
    Dg, Ig = idx.search_batch(q, k=10, n_probe=4, method="gather")
    Ds, Is = idx.search_batch(q, k=10, n_probe=4, method="stream")
    for a, b in zip(Ig, Is):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(Dg, Ds, rtol=1e-4, atol=1e-4)


def test_stream_norerank_default_quantized_exact(built, monkeypatch):
    """The bf16 stream DEFAULT (two-pass cross, no re-rank —
    bench_results/stream_overhead: the re-rank was 65% of the path) returns
    the EXACT f32 distance to the quantized point c + r-hat: vs the exact
    path the distance error is bounded by 2|q-x||r - r-hat| + |r - r-hat|^2
    (~0.2%-of-residual scale), result sets stay >=0.9 intersected, and a
    corpus vector queried against itself keeps distance ~0 (the old
    |q-c|-scale single-pass error broke exactly this)."""
    monkeypatch.delenv("VITPU_STREAM_RERANK", raising=False)
    store, data = built
    idx = IvfIndex.fit(store, seed=42)
    q = data[:16] + 0.01
    Dg, Ig = idx.search_batch(q, k=10, n_probe=4, method="gather")
    Ds, Is = idx.search_batch(q, k=10, n_probe=4, method="stream")
    inter = np.mean(
        [
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / 10
            for a, b in zip(Ig, Is)
        ]
    )
    assert inter >= 0.9
    # Distances of the COMMON results agree to quantization error.
    for dg, ig, ds, is_ in zip(Dg, Ig, Ds, Is):
        pos = {int(r): j for j, r in enumerate(is_)}
        for j, r in enumerate(ig):
            if int(r) in pos:
                assert abs(dg[j] - ds[pos[int(r)]]) <= 1e-2 + 0.01 * dg[j]
    # Self-queries: distance to itself stays ~0 (and never negative).
    Dself, Iself = idx.search_batch(data[:8], k=1, n_probe=4, method="stream")
    assert (Dself >= 0).all()
    assert float(Dself.max()) <= 1e-2
    # Same contract under ip: scores are exact -q.x-hat (two-pass cross),
    # so result sets track the exact path without a re-rank.
    from vector_indexer_tpu.storage import VectorStore

    store_ip = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    m = IvfIndex.fit(store_ip, seed=1, metric="ip")
    Dgi, Igi = m.search_batch(q, k=10, n_probe=4, method="gather")
    Dsi, Isi = m.search_batch(q, k=10, n_probe=4, method="stream")
    inter_ip = np.mean(
        [
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / 10
            for a, b in zip(Igi, Isi)
        ]
    )
    assert inter_ip >= 0.9


def test_pick_stream_groups():
    assert pick_stream_groups(256) == 4
    assert pick_stream_groups(512) == 2
    assert pick_stream_groups(1024) == 1
    # G always divides FAN so fans route to groups round-robin
    from vector_indexer_tpu.ops.pallas.block_stream import FAN

    for c in (256, 512, 1024):
        assert FAN % pick_stream_groups(c) == 0
