"""IVF range-DMA gather kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_indexer_tpu.ops.pallas.ivf_gather import ivf_gather_distances


def _reference(queries, vectors, starts, lengths, width):
    # Probe j's slots start at sum of round_up(len, 128) over earlier probes
    # (the kernel's lane-aligned packing); holes stay inf/-1.
    nq = queries.shape[0]
    dist = np.full((nq, width), np.inf, np.float32)
    rows = np.full((nq, width), -1, np.int32)
    for q in range(nq):
        slot = 0
        for s, ln in zip(starts[q], lengths[q]):
            for i in range(ln):
                r = s + i
                diff = queries[q] - vectors[r]
                dist[q, slot + i] = (diff * diff).sum()
                rows[q, slot + i] = r
            slot += -(-ln // 128) * 128
    return dist, rows


def test_gather_kernel_matches_reference(rng):
    d, n = 16, 300
    vectors = np.zeros((n + 128, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(3, d)).astype(np.float32)
    starts = np.array([[0, 100, 250], [50, 0, 200], [250, 10, 0]], np.int32)
    lengths = np.array([[10, 25, 50], [5, 0, 40], [50, 3, 1]], np.int32)
    budget = 128

    dist, rows = ivf_gather_distances(
        jnp.asarray(queries), jnp.asarray(vectors),
        jnp.asarray(starts), jnp.asarray(lengths),
        max_len=64, budget=budget, interpret=True,
    )
    got_d, got_r = np.asarray(dist), np.asarray(rows)
    want_d, want_r = _reference(queries, vectors, starts, lengths, got_d.shape[1])
    np.testing.assert_array_equal(got_r, want_r)
    finite = np.isfinite(want_d)
    np.testing.assert_allclose(got_d[finite], want_d[finite], rtol=1e-4, atol=1e-4)
    assert np.isinf(got_d[~finite]).all()


def test_gather_kernel_ip_metric(rng):
    """metric='ip' ranks by -q.x over the same packed slots (cosine is ip
    over unit vectors, normalized upstream of the kernel)."""
    d, n = 16, 300
    vectors = np.zeros((n + 128, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(3, d)).astype(np.float32)
    starts = np.array([[0, 100, 250], [50, 0, 200], [250, 10, 0]], np.int32)
    lengths = np.array([[10, 25, 50], [5, 0, 40], [50, 3, 1]], np.int32)

    dist, rows = ivf_gather_distances(
        jnp.asarray(queries), jnp.asarray(vectors),
        jnp.asarray(starts), jnp.asarray(lengths),
        max_len=64, budget=128, metric="ip", interpret=True,
    )
    got_d, got_r = np.asarray(dist), np.asarray(rows)
    _, want_r = _reference(queries, vectors, starts, lengths, got_d.shape[1])
    np.testing.assert_array_equal(got_r, want_r)
    filled = want_r >= 0
    want_ip = -np.einsum(
        "qd,qkd->qk", queries,
        vectors[np.maximum(want_r, 0)], dtype=np.float64,
    ).astype(np.float32)
    np.testing.assert_allclose(
        got_d[filled], want_ip[filled], rtol=1e-4, atol=1e-4
    )
    assert np.isinf(got_d[~filled]).all()


def test_gather_kernel_zero_lengths(rng):
    d = 8
    vectors = np.zeros((64, d), np.float32)
    queries = rng.normal(size=(1, d)).astype(np.float32)
    starts = np.zeros((1, 4), np.int32)
    lengths = np.zeros((1, 4), np.int32)
    dist, rows = ivf_gather_distances(
        jnp.asarray(queries), jnp.asarray(vectors),
        jnp.asarray(starts), jnp.asarray(lengths),
        max_len=16, budget=32, interpret=True,
    )
    assert np.isinf(np.asarray(dist)).all()
    assert (np.asarray(rows) == -1).all()
