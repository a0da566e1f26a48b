"""Fused flat-sweep Pallas kernel tests (interpret mode, CPU backend).

Validates the windowed arg-min semantics of ops/pallas/flat_sweep.py
against a numpy oracle: exact distances, per-strided-window minima, the
unconditional survival of the true nearest neighbor, tail-lane masking,
the ip metric, and the block-mask (IVF dense) variant. Mirrors the
reference's exhaustive re-rank behavior checks
(/root/reference/src/ivf_index.rs:251-266) at the kernel level.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vector_indexer_tpu.ops.pallas.flat_sweep import (
    MASK_ALIGN,
    S,
    flat_sweep_minreduce,
    flat_sweep_topk_plane,
    pick_groups,
    pick_window,
)


def _mk(n, d, nq, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    norms = (x * x).sum(1).astype(np.float32)
    return x, q, norms


@pytest.mark.parametrize("w", [8, 16, 32])
def test_window_minima_match_oracle(w):
    n, d, nq = 5000 if w > 8 else 1000, 128, 16
    NB = S * w
    x, q, norms = _mk(n, d, nq)
    vals, rows = flat_sweep_minreduce(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T  # kernel omits q_sq (lane-constant)
    nj = -(-n // NB)
    assert vals.shape == (nq, nj * S)
    for j in range(nj):
        blk = np.full((nq, NB), np.inf, np.float32)
        hi = min(n, (j + 1) * NB)
        blk[:, : hi - j * NB] = dist[:, j * NB : hi]
        for c in range(0, S, 17):  # sample lanes
            exp_v = blk[:, c::S].min(1)
            got_v = vals[:, j * S + c]
            fin = np.isfinite(exp_v)
            np.testing.assert_allclose(got_v[fin], exp_v[fin], atol=1e-3)
            assert not np.isfinite(got_v[~fin]).any()
    # row ids must index into the table and reproduce their own distance
    fin = np.isfinite(vals)
    r = rows[fin]
    assert ((r >= 0) & (r < n)).all()
    np.testing.assert_allclose(
        vals[fin], dist[np.nonzero(fin)[0], r], atol=1e-3
    )


def test_true_nearest_always_survives_and_topk_recall():
    n, d, nq, w = 1000, 128, 16, 8
    x, q, norms = _mk(n, d, nq, seed=1)
    vals, rows = flat_sweep_minreduce(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T
    gt = dist.argmin(1)
    for i in range(nq):
        assert gt[i] in rows[i][np.isfinite(vals[i])]
        surv10 = rows[i][np.argsort(vals[i])[:10]]
        exact10 = np.argsort(dist[i])[:10]
        assert len(set(surv10) & set(exact10)) >= 8


def test_ip_metric_nearest_survives():
    n, d, nq, w = 1000, 128, 16, 8
    x, q, norms = _mk(n, d, nq, seed=2)
    vals, rows = flat_sweep_minreduce(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="ip", w=w, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = -(q @ x.T)
    gt = dist.argmin(1)
    for i in range(nq):
        assert gt[i] in rows[i][np.isfinite(vals[i])]


def test_masked_variant_respects_block_mask():
    n, d, nq, w = 1000, 128, 16, 8
    NB = S * w
    nj = -(-n // NB)
    x, q, norms = _mk(n, d, nq, seed=3)
    rng = np.random.default_rng(7)
    mask = (rng.random((nq, -(-n // MASK_ALIGN))) < 0.3).astype(np.float32)
    mcols = nj * NB // MASK_ALIGN
    mask_p = np.zeros((nq, mcols), np.float32)
    mask_p[:, : mask.shape[1]] = mask
    vals, rows = flat_sweep_minreduce(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        jnp.asarray(mask_p),
        metric="l2", w=w, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T
    rowmask = np.repeat(mask, MASK_ALIGN, axis=1)[:, :n] > 0.5
    dm = np.where(rowmask, dist, np.inf)
    for i in range(nq):
        fin = np.isfinite(vals[i])
        # no unprobed row may survive
        assert rowmask[i][rows[i][fin]].all()
        if np.isfinite(dm[i]).any():
            assert dm[i].argmin() in rows[i][fin]


def test_sentinel_gap_rows_excluded():
    n, d, nq, w = 600, 128, 8, 8
    x, q, norms = _mk(n, d, nq, seed=4)
    norms = norms.copy()
    norms[50:80] = 1e30  # gap rows (SENTINEL_NORM)
    vals, rows = flat_sweep_minreduce(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    fin = vals < 1e29
    assert not np.isin(rows[fin], np.arange(50, 80)).any()


def test_topk_plane_nn_survives_and_values_exact():
    n, d, nq, w, C = 5000, 128, 16, 8, 4
    x, q, norms = _mk(n, d, nq, seed=5)
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, c_groups=C, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    assert vals.shape == (nq, 2 * C * S)
    dist = norms[None, :] - 2.0 * q @ x.T
    gt = dist.argmin(1)
    fin = np.isfinite(vals)
    # unfilled slots are (-1, +inf); filled slots reproduce exact distances
    assert (rows[~fin] == -1).all()
    np.testing.assert_allclose(
        vals[fin], dist[np.nonzero(fin)[0], rows[fin]], atol=1e-3
    )
    for i in range(nq):
        assert gt[i] in rows[i][fin[i]]
        # top-10 through the plane ~matches exact top-10 (tail loss only)
        surv10 = set(rows[i][np.argsort(vals[i])[:10]].tolist())
        exact10 = set(np.argsort(dist[i])[:10].tolist())
        assert len(surv10 & exact10) >= 8
    # no duplicate rows inside a lane's (best, second) pair
    CS = C * S
    dup = (rows[:, :CS] == rows[:, CS:]) & (rows[:, :CS] >= 0)
    assert not dup.any()


def test_topk_plane_3pass_precision():
    """The bf16 hi/lo 3-pass sweep (the serving default: 1.42x the 6-pass
    HIGHEST matmul, which is the MXU-bound path's whole cost) must track
    an fp64 oracle to ~1e-3 absolute at d=128 magnitudes, keep the true
    NN unconditionally, and select (nearly) the same plane rows as
    'highest'."""
    n, d, nq, w, C = 4096, 128, 8, 8, 4
    x, q, norms = _mk(n, d, nq, seed=7)
    args = (jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms))
    v3, r3 = flat_sweep_topk_plane(
        *args, metric="l2", w=w, c_groups=C, q_tile=8,
        precision="3pass", interpret=True,
    )
    vh, rh = flat_sweep_topk_plane(
        *args, metric="l2", w=w, c_groups=C, q_tile=8,
        precision="highest", interpret=True,
    )
    v3, r3, rh = np.asarray(v3), np.asarray(r3), np.asarray(rh)
    dist64 = (
        norms.astype(np.float64)[None, :]
        - 2.0 * q.astype(np.float64) @ x.astype(np.float64).T
    )
    fin = np.isfinite(v3)
    # atol 3e-2 is the INTERPRET-mode bound (numpy accumulates bf16 dots
    # in bf16); on-chip the MXU accumulates in f32 and the measured
    # plane-value deviation vs fp64 is <= ~3e-4.
    np.testing.assert_allclose(
        v3[fin], dist64[np.nonzero(fin)[0], r3[fin]], atol=3e-2
    )
    gt = dist64.argmin(1)
    for i in range(nq):
        assert gt[i] in r3[i][fin[i]]
    # precision must not change which candidates survive (ties aside)
    assert (r3 == rh).mean() > 0.99


def test_topk_plane_ip_and_sentinel():
    n, d, nq, w, C = 2000, 128, 8, 8, 2
    x, q, norms = _mk(n, d, nq, seed=6)
    norms = norms.copy()
    norms[100:130] = 1e30  # gap rows
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="ip", w=w, c_groups=C, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    fin = vals < 1e29
    assert not np.isin(rows[fin], np.arange(100, 130)).any()
    dist = -(q @ x.T)
    dist[:, 100:130] = np.inf
    gt = dist.argmin(1)
    for i in range(nq):
        assert gt[i] in rows[i][fin[i]]


def test_topk_plane_masked_variant():
    n, d, nq, w, C = 2000, 128, 8, 8, 2
    NB = S * w
    nj = -(-n // NB)
    x, q, norms = _mk(n, d, nq, seed=7)
    rng = np.random.default_rng(11)
    mask = (rng.random((nq, -(-n // MASK_ALIGN))) < 0.3).astype(np.float32)
    mcols = nj * NB // MASK_ALIGN
    mask_p = np.zeros((nq, mcols), np.float32)
    mask_p[:, : mask.shape[1]] = mask
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        jnp.asarray(mask_p),
        metric="l2", w=w, c_groups=C, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T
    rowmask = np.repeat(mask, MASK_ALIGN, axis=1)[:, :n] > 0.5
    dm = np.where(rowmask, dist, np.inf)
    for i in range(nq):
        fin = np.isfinite(vals[i])
        assert rowmask[i][rows[i][fin]].all()
        if np.isfinite(dm[i]).any():
            assert dm[i].argmin() in rows[i][fin]


def test_fused_flat_program_matches_oracle():
    """Full program (kernel + top_k epilogue + q_sq add + sentinel filter)
    vs the exact oracle, in interpret mode."""
    from vector_indexer_tpu.index.ivf import _flat_search_fused_program

    n, d, nq, k = 3000, 128, 32, 10
    x, q, norms = _mk(n, d, nq, seed=8)
    norms = norms.copy()
    norms[500:540] = 1e30  # gap rows must never be returned
    D, I = _flat_search_fused_program(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        k=k, q_tile=8, w=8, c_groups=2, metric="l2", interpret=True,
    )
    D, I = np.asarray(D), np.asarray(I)
    q_sq = (q * q).sum(1)
    dist = norms[None, :] + q_sq[:, None] - 2.0 * q @ x.T
    dist[:, 500:540] = np.inf
    for i in range(nq):
        assert not np.isin(I[i], np.arange(500, 540)).any()
        # true NN is always first, distances exact and ascending
        assert I[i, 0] == dist[i].argmin()
        np.testing.assert_allclose(D[i], dist[i][I[i]], rtol=1e-5, atol=1e-2)
        assert (np.diff(D[i]) >= -1e-4).all()
        # near-exact top-k (plane tail loss only; tiny n = worst case)
        exact = set(np.argsort(dist[i])[:k].tolist())
        assert len(set(I[i].tolist()) & exact) >= k - 2


def test_fused_flat_program_ip_metric():
    from vector_indexer_tpu.index.ivf import _flat_search_fused_program

    n, d, nq, k = 2000, 128, 16, 10
    x, q, norms = _mk(n, d, nq, seed=9)
    D, I = _flat_search_fused_program(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        k=k, q_tile=8, w=8, c_groups=2, metric="ip", interpret=True,
    )
    D, I = np.asarray(D), np.asarray(I)
    dist = -(q @ x.T)
    for i in range(nq):
        assert I[i, 0] == dist[i].argmin()
        np.testing.assert_allclose(D[i], dist[i][I[i]], rtol=1e-4, atol=1e-3)


def test_dense_fused_program_matches_xla_dense():
    """The fused masked-dense program returns the same result set as the
    XLA masked-dense program (exact variant) on a real built index, across
    nprobe points — one compile serves all of them (n_probe stays traced)."""
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.index.ivf import (
        _ivf_search_dense_fused_program,
        _ivf_search_dense_program,
    )
    from vector_indexer_tpu.storage import VectorStore

    rng = np.random.default_rng(3)
    n, d, nq, k = 4000, 128, 24, 10
    centers = rng.normal(0, 5.0, size=(12, d)).astype(np.float32)
    data = (centers[rng.integers(0, 12, n)]
            + rng.normal(0, 0.4, (n, d))).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, nlist=16, seed=42)
    lay = idx.layout
    run_starts_b, centroids_ord, c_sq_ord = idx._run_tables()
    q = jnp.asarray(data[:nq] + rng.normal(0, 0.1, (nq, d)).astype(np.float32))

    for n_probe in (2, 7):
        D_ref, I_ref = _ivf_search_dense_program(
            q, centroids_ord, c_sq_ord, lay.vectors, lay.row_norms,
            run_starts_b, jnp.int32(n_probe),
            k=k, q_tile=8, approx=False,
        )
        D_f, I_f = _ivf_search_dense_fused_program(
            q, centroids_ord, c_sq_ord, lay.vectors, lay.row_norms,
            run_starts_b, jnp.int32(n_probe),
            k=k, q_tile=8, w=8, c_groups=2, interpret=True,
        )
        D_ref, I_ref = np.asarray(D_ref), np.asarray(I_ref)
        D_f, I_f = np.asarray(D_f), np.asarray(I_f)
        # The tiny 2*C*S=512-slot plane overflows at this operating point
        # (~n_probe/nlist*n probed candidates), so the top-k TAIL may lose
        # entries — but the best result is guaranteed identical, returned
        # distances are exact, and overlap stays high. (At serving configs
        # the plane is 2048 slots and the expected loss is ~0.4%.)
        np.testing.assert_array_equal(I_f[:, 0], I_ref[:, 0])
        for i in range(nq):
            ref, got = list(I_ref[i]), I_f[i]
            shared = [r for r in got if r in ref]
            assert len(shared) >= k - 2
            # Shared rows track the reference distances. atol 0.03: the
            # serving default is the 3pass bf16 hi/lo sweep, and
            # INTERPRET mode accumulates bf16 dots in bf16 (numpy),
            # unlike the MXU's f32 accumulators — measured on-chip the
            # end-to-end delta vs the exact path is <= ~2e-3.
            np.testing.assert_allclose(
                np.array([D_f[i][list(got).index(r)] for r in shared]),
                np.array([D_ref[i][ref.index(r)] for r in shared]),
                rtol=1e-5, atol=3e-2,
            )


def test_topk_plane_loss_model_holds_at_scale():
    """The plan gate's loss model must UPPER-bound reality at a serving-
    scale operating point (n=50k, k=100, w=8, C=8): measured top-100 tail
    loss stays below the model prediction, top-10 is lossless, and the
    true NN is never lost (measured 0.80% vs model 1.25% on this seed)."""
    n, d, nq, k, w, C = 50_000, 128, 64, 100, 8, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    norms = (x * x).sum(1).astype(np.float32)
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, c_groups=C, q_tile=32, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T
    loss_k, loss_10 = [], []
    for i in range(nq):
        top = rows[i][np.argsort(vals[i])[:k]]
        exact = np.argsort(dist[i])[:k]
        assert exact[0] in set(top.tolist())  # NN unconditionally kept
        loss_k.append(k - len(set(top.tolist()) & set(exact.tolist())))
        loss_10.append(
            10 - len(set(top[:10].tolist()) & set(exact[:10].tolist()))
        )
    model = (k - 1) * w / (2.0 * n) + (k - 1) * (k - 2) / (
        2.0 * (C * S) ** 2
    )
    assert np.mean(loss_k) / k <= model  # model is an upper bound here
    assert np.mean(loss_10) <= 0.05  # top-10 effectively lossless


def test_topk_plane_more_groups_than_steps():
    """C > nj leaves whole accumulator groups untouched: they must come
    back as (+inf, -1) slots and never pollute results."""
    n, d, nq, w, C = 1500, 128, 8, 8, 8  # nj=2 < C=8
    x, q, norms = _mk(n, d, nq, seed=10)
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(norms),
        metric="l2", w=w, c_groups=C, q_tile=8, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    fin = np.isfinite(vals)
    assert (rows[~fin] == -1).all()
    # only 2 groups (x2 for top-2) can hold data; the rest stay empty
    assert fin.sum(axis=1).max() <= 4 * S
    dist = norms[None, :] - 2.0 * q @ x.T
    for i in range(nq):
        assert dist[i].argmin() in rows[i][fin[i]]


def test_pick_groups_bounds():
    for n in (1000, 100_000, 4_000_000):
        for w in (8, 16, 32):
            c = pick_groups(n, w, 100)
            assert 1 <= c <= 8
            assert c <= max(1, -(-n // (S * w)))


def test_plan_fused_fits_vmem():
    from vector_indexer_tpu.ops.pallas.flat_sweep import plan_fused

    # large k must fall back to XLA: plane capacity / tail-loss gate
    assert plan_fused(100_000, 128, 1024, 1000) is None
    assert plan_fused(100_000, 128, 1024, 100) is not None
    for n in (100_000, 1_000_000):
        for d in (128, 256, 512, 1536, 3072):
            plan = plan_fused(n, d, 1024, 100)
            if plan is None:
                # over-VMEM dims fall back to the XLA program — only huge d
                assert d >= 3072, (n, d)
                continue
            w, qt, c = plan
            need = (
                2 * (S * w) * d * 4
                + qt * d * 4
                + 4 * qt * c * S * 4
                + 2 * qt * (S * w) * 4
            )
            assert need <= 13 << 20
            assert w >= 4 and qt % 8 == 0 and 1 <= c <= 8


def test_pick_window_bounds():
    for n in (10_000, 100_000, 1_000_000, 30_000_000):
        for k in (1, 10, 100):
            w = pick_window(n, k)
            assert w in (8, 16, 32)


def test_quantize_table_int8_reconstruction_bound():
    """x ~= sx*x8 + (sx/SHIFT)*r8 with |err| <= sx/(2*SHIFT) per element;
    zero (gap/tail) rows quantize to exact zeros."""
    from vector_indexer_tpu.ops.pallas.flat_sweep import (
        SHIFT, quantize_table_int8,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 128)).astype(np.float32)
    x[100:110] = 0.0  # gap rows are zero vectors
    x8, r8, sx = quantize_table_int8(jnp.asarray(x))
    x8, r8, sx = np.asarray(x8), np.asarray(r8), np.asarray(sx)
    rec = x8.astype(np.float32) * sx[:, None] + r8.astype(np.float32) * (
        sx[:, None] / SHIFT
    )
    err = np.abs(rec - x)
    assert (err <= sx[:, None] / (2 * SHIFT) + 1e-7).all()
    assert (x8[100:110] == 0).all() and (r8[100:110] == 0).all()


@pytest.mark.parametrize("prec,floor,derr", [("int8", 0.97, 0.05), ("int8x1", 0.92, 1.5)])
def test_topk_plane_int8_modes(prec, floor, derr):
    """Fixed-point int8 sweeps: returned values track the exact distances
    within the mode's error band and top-10 recall vs the exact oracle
    holds its floor (plane tail loss included) on isotropic data."""
    from vector_indexer_tpu.ops.pallas.flat_sweep import quantize_table_int8

    n, d, nq = 5000, 128, 16
    x, q, norms = _mk(n, d, nq, seed=12)
    x8, r8, sx = quantize_table_int8(jnp.asarray(x))
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), x8, jnp.asarray(norms), None,
        r8 if prec == "int8" else None, sx,
        metric="l2", w=8, c_groups=4, q_tile=8,
        precision=prec, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = norms[None, :] - 2.0 * q @ x.T
    fin = np.isfinite(vals)
    assert (rows[~fin] == -1).all()
    err = np.abs(vals[fin] - dist[np.nonzero(fin)[0], rows[fin]])
    assert err.max() <= derr
    hits = 0
    for i in range(nq):
        top10 = rows[i][np.argsort(vals[i])[:10]]
        hits += len(set(top10.tolist()) & set(np.argsort(dist[i])[:10].tolist()))
    assert hits / (10 * nq) >= floor


@pytest.mark.parametrize("prec,derr", [("int8", 0.05), ("int8x1", 1.5)])
def test_topk_plane_int8_modes_ip(prec, derr):
    """ip-metric twin of test_topk_plane_int8_modes: the int8 epilogue's
    ip branch (dist = sentinel-or-0 minus the dequantized cross term,
    flat_sweep.py _window_min_step) must track -q.x within the mode's
    error band and hold top-10 recall vs the exact oracle."""
    from vector_indexer_tpu.ops.pallas.flat_sweep import quantize_table_int8

    n, d, nq = 5000, 128, 16
    x, q, norms = _mk(n, d, nq, seed=13)
    x8, r8, sx = quantize_table_int8(jnp.asarray(x))
    vals, rows = flat_sweep_topk_plane(
        jnp.asarray(q), x8, jnp.asarray(norms), None,
        r8 if prec == "int8" else None, sx,
        metric="ip", w=8, c_groups=4, q_tile=8,
        precision=prec, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    dist = -(q @ x.T)  # smaller = better under the kernel's ip convention
    fin = np.isfinite(vals)
    assert (rows[~fin] == -1).all()
    err = np.abs(vals[fin] - dist[np.nonzero(fin)[0], rows[fin]])
    assert err.max() <= derr
    hits = 0
    for i in range(nq):
        top10 = rows[i][np.argsort(vals[i])[:10]]
        hits += len(set(top10.tolist()) & set(np.argsort(dist[i])[:10].tolist()))
    assert hits / (10 * nq) >= 0.9


def test_int8_program_cosine_matches_exact_twin():
    """Program level, cosine metric: the int8 flat fused program (which
    normalizes queries before the ip ranking) returns the same NN and
    nearly the same top-k set as its exact cosine twin."""
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.index.ivf import _flat_search_fused_program
    from vector_indexer_tpu.ops.pallas.flat_sweep import quantize_table_int8
    from vector_indexer_tpu.storage import VectorStore

    rng = np.random.default_rng(7)
    n, d, nq, k = 4000, 128, 16, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, nlist=16, seed=42, metric="cosine")
    lay = idx.layout
    q = data[:nq] + rng.normal(0, 0.05, (nq, d)).astype(np.float32)
    qn = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    x8, r8, sx = quantize_table_int8(lay.vectors)

    Di, Ii = _flat_search_fused_program(
        qn, x8, lay.row_norms, r8, sx,
        k=k, q_tile=8, w=8, c_groups=2, metric="ip",
        precision="int8", interpret=True,
    )
    De, Ie = _flat_search_fused_program(
        qn, lay.vectors, lay.row_norms,
        k=k, q_tile=8, w=8, c_groups=2, metric="ip", interpret=True,
    )
    Ii, Ie, Di, De = map(np.asarray, (Ii, Ie, Di, De))
    assert (Ii[:, 0] == Ie[:, 0]).all()  # self-hit NN survives int8 cosine
    overlap = np.mean([len(set(Ii[i]) & set(Ie[i])) for i in range(nq)])
    assert overlap >= k - 1
    assert np.abs(Di - De).max() <= 5e-2


def test_int8_fused_programs_match_exact_twin():
    """Program level: the int8 flat and masked-dense fused programs return
    (nearly) the same result set as their exact twins on a real built
    index, and the int8 distances track the exact ones to ~2e-2."""
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.index.ivf import (
        _flat_search_fused_program,
        _ivf_search_dense_fused_program,
    )
    from vector_indexer_tpu.ops.pallas.flat_sweep import quantize_table_int8
    from vector_indexer_tpu.storage import VectorStore

    rng = np.random.default_rng(5)
    n, d, nq, k = 4000, 128, 16, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, nlist=16, seed=42)
    lay = idx.layout
    q = jnp.asarray(
        data[:nq] + rng.normal(0, 0.05, (nq, d)).astype(np.float32)
    )
    x8, r8, sx = quantize_table_int8(lay.vectors)

    Di, Ii = _flat_search_fused_program(
        q, x8, lay.row_norms, r8, sx,
        k=k, q_tile=8, w=8, c_groups=2, precision="int8", interpret=True,
    )
    De, Ie = _flat_search_fused_program(
        q, lay.vectors, lay.row_norms,
        k=k, q_tile=8, w=8, c_groups=2, interpret=True,
    )
    Ii, Ie, Di, De = map(np.asarray, (Ii, Ie, Di, De))
    assert (Ii[:, 0] == Ie[:, 0]).all()  # self-hit NN survives int8
    overlap = np.mean([len(set(Ii[i]) & set(Ie[i])) for i in range(nq)])
    assert overlap >= k - 1
    assert np.abs(Di - De).max() <= 5e-2

    run_starts_b, cord, csq = idx._run_tables()
    Dd, Id = _ivf_search_dense_fused_program(
        q, cord, csq, x8, lay.row_norms, run_starts_b, jnp.int32(4),
        r8, sx, k=k, q_tile=8, w=8, c_groups=2,
        precision="int8", interpret=True,
    )
    Dd2, Id2 = _ivf_search_dense_fused_program(
        q, cord, csq, lay.vectors, lay.row_norms, run_starts_b,
        jnp.int32(4), k=k, q_tile=8, w=8, c_groups=2, interpret=True,
    )
    Id, Id2 = np.asarray(Id), np.asarray(Id2)
    assert (Id[:, 0] == Id2[:, 0]).all()
    overlap = np.mean([len(set(Id[i]) & set(Id2[i])) for i in range(nq)])
    assert overlap >= k - 1


def test_int8_methods_degrade_to_exact_on_cpu():
    """Like the fused methods, the int8 methods fall back to the exact XLA
    twins on the CPU backend (interpret mode is too slow to serve)."""
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.storage import VectorStore

    rng = np.random.default_rng(6)
    n, d, nq, k = 2000, 128, 8, 5
    data = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(
        external_ids=np.arange(n, dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, nlist=8, seed=42)
    q = data[:nq]
    for m, twin in (
        ("flat_int8", "flat"), ("flat_int8x1", "flat"),
        ("dense_int8", "dense"), ("dense_int8x1", "dense"),
    ):
        D, I = idx.search_batch_device(q, k, 4, method=m)
        D2, I2 = idx.search_batch_device(q, k, 4, method=twin)
        np.testing.assert_array_equal(np.asarray(I), np.asarray(I2))


def test_plan_fused_int8_gates():
    from vector_indexer_tpu.ops.pallas.flat_sweep import plan_fused

    # d beyond the int32 accumulator bound must decline the int8 plan
    assert plan_fused(100_000, 3072, 1024, 100, precision="int8") is None
    for prec in ("int8", "int8x1"):
        plan = plan_fused(1_000_000, 128, 1024, 100, precision=prec)
        assert plan is not None
        w, qt, c = plan
        assert w in (8, 16, 32) and qt % 8 == 0 and 1 <= c <= 8
