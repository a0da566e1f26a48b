"""L0 kernel-core tests: distances, top-k, brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_indexer_tpu.ops import (
    assign_chunked,
    brute_force_topk,
    euclidean_distance_squared,
    merge_topk,
    pairwise_sq_l2,
    topk_smallest,
)


def _np_pairwise(x, c):
    return ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)


def test_pairwise_matches_numpy(rng):
    x = rng.normal(size=(37, 19)).astype(np.float32)
    c = rng.normal(size=(11, 19)).astype(np.float32)
    got = np.asarray(pairwise_sq_l2(jnp.asarray(x), jnp.asarray(c)))
    want = _np_pairwise(x, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_nonnegative_and_zero_diag(rng):
    x = rng.normal(size=(16, 64)).astype(np.float32) * 100
    d = np.asarray(pairwise_sq_l2(jnp.asarray(x), jnp.asarray(x)))
    assert (d >= 0).all()
    # The ||x||^2 - 2xy + ||y||^2 expansion carries cancellation error of
    # order eps * ||x||^2 (~0.08 here); the diagonal must be zero to within
    # that, not to machine zero.
    max_norm_sq = (x * x).sum(1).max()
    np.testing.assert_allclose(np.diag(d), 0.0, atol=8e-7 * max_norm_sq)


def test_scalar_distance():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([4.0, 6.0, 3.0])
    assert float(euclidean_distance_squared(a, b)) == pytest.approx(25.0)


def test_assign_chunked_matches_dense(rng):
    x = rng.normal(size=(1000, 24)).astype(np.float32)
    c = rng.normal(size=(13, 24)).astype(np.float32)
    labels, dists = assign_chunked(jnp.asarray(x), jnp.asarray(c), chunk=256)
    want = _np_pairwise(x, c)
    np.testing.assert_array_equal(np.asarray(labels), want.argmin(1))
    np.testing.assert_allclose(np.asarray(dists), want.min(1), rtol=1e-4, atol=1e-4)


def test_topk_smallest_basic():
    d = jnp.array([[5.0, 1.0, 3.0, 2.0, 4.0]])
    vals, idx = topk_smallest(d, 3)
    np.testing.assert_allclose(np.asarray(vals)[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(idx)[0], [1, 3, 2])


def test_topk_pads_when_k_exceeds_n():
    d = jnp.array([[2.0, 1.0]])
    vals, idx = topk_smallest(d, 5)
    assert vals.shape == (1, 5)
    assert np.isinf(np.asarray(vals)[0, 2:]).all()
    assert (np.asarray(idx)[0, 2:] == -1).all()


def test_merge_topk(rng):
    a = np.sort(rng.uniform(size=(4, 6)).astype(np.float32), axis=1)
    b = np.sort(rng.uniform(size=(4, 6)).astype(np.float32), axis=1)
    ia = np.arange(6, dtype=np.int32)[None].repeat(4, 0)
    ib = (np.arange(6, dtype=np.int32) + 100)[None].repeat(4, 0)
    vals, idx = merge_topk(jnp.asarray(a), jnp.asarray(ia), jnp.asarray(b), jnp.asarray(ib), 4)
    want = np.sort(np.concatenate([a, b], axis=1), axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)
    # Indices must map back to the right source stream.
    assert set(np.asarray(idx).ravel().tolist()) <= set(range(6)) | set(range(100, 106))


@pytest.mark.parametrize("n,chunk", [(500, 128), (1000, 1000), (777, 256)])
def test_brute_force_topk_exact(rng, n, chunk):
    d = 32
    db = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(9, d)).astype(np.float32)
    vals, idx = brute_force_topk(jnp.asarray(q), jnp.asarray(db), 10, db_chunk=chunk)
    full = _np_pairwise(q, db)
    want_idx = np.argsort(full, axis=1, kind="stable")[:, :10]
    want_vals = np.take_along_axis(full, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-3, atol=1e-3)
    # Ties can permute; compare distance-sets rather than raw index order.
    got_d = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.sort(got_d, 1), np.sort(want_vals, 1), rtol=1e-3, atol=1e-3)


def test_brute_force_row_norm_mask(rng):
    """db_row_norms >= 1e29 excludes rows even when their VECTORS duplicate
    the true neighbor (the packed layout's gap rows clamp perm=-1 to row 0,
    so a layout-table GT must mask by norm, not by value)."""
    d = 16
    db = rng.normal(size=(200, d)).astype(np.float32)
    db[50:60] = db[0]  # gap rows duplicating a real row
    norms = (db * db).sum(1)
    norms[50:60] = 1e30  # SENTINEL_NORM
    q = db[:5] + 0.001
    vals, idx = brute_force_topk(
        jnp.asarray(q), jnp.asarray(db), 12,
        db_chunk=64, db_row_norms=jnp.asarray(norms),
    )
    idx = np.asarray(idx)
    assert idx[0, 0] == 0
    assert not np.isin(idx, np.arange(50, 60)).any()
    # unmasked call DOES surface the duplicates (the hazard being masked)
    _, idx_u = brute_force_topk(jnp.asarray(q), jnp.asarray(db), 12, db_chunk=64)
    assert np.isin(np.asarray(idx_u)[0], np.arange(50, 60)).any()


def test_brute_force_high_dim(rng):
    db = rng.normal(size=(300, 1536)).astype(np.float32)
    q = db[:5] + 0.001
    vals, idx = brute_force_topk(jnp.asarray(q), jnp.asarray(db), 1)
    np.testing.assert_array_equal(np.asarray(idx).ravel(), np.arange(5))


def test_candidate_budget():
    from vector_indexer_tpu.ops.gather import candidate_budget

    lens = np.array([10, 500, 20, 300, 5])
    # top-2 longest: 500 + 300 = 800 -> quantized up to the {2^m, 1.5*2^m}
    # compile-reuse grid (1024), always a 128-multiple.
    assert candidate_budget(lens, 2) == 1024
    assert candidate_budget(lens, 2, cap=256) == 256
    assert candidate_budget(lens, 100) >= lens.sum()
    assert candidate_budget(np.array([1]), 4) == 128  # min alignment
    # Never truncates; nearby operating points share a grid value.
    assert candidate_budget(lens, 3) == candidate_budget(lens, 4) == 1024


def test_quantize_up_grid():
    from vector_indexer_tpu.ops.gather import quantize_up

    assert [quantize_up(x) for x in (1, 2, 3, 5, 96, 97, 128, 129)] == [
        1, 2, 3, 6, 96, 128, 128, 192,
    ]
    for x in (7, 100, 1000, 12345):
        q = quantize_up(x)
        assert x <= q <= int(x * 4 / 3) + 1  # <= 33% overshoot


def test_packed_candidate_rows_truncation():
    import jax.numpy as jnp

    from vector_indexer_tpu.ops.gather import packed_candidate_rows

    starts = jnp.array([[0, 100]], dtype=jnp.int32)
    lengths = jnp.array([[8, 8]], dtype=jnp.int32)
    rows, valid = packed_candidate_rows(starts, lengths, budget=10, pad_row=999)
    r = np.asarray(rows)[0]
    # First probe fully packed, second truncated at the budget (nearest-first).
    np.testing.assert_array_equal(r[:8], np.arange(8))
    np.testing.assert_array_equal(r[8:10], [100, 101])
    assert np.asarray(valid)[0].all()
