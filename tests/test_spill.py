"""Spilled (SOAR multi-assignment) builds: structure, dedup, persistence.

The reference is single-assignment only; spill is this framework's
recall-per-probe extension (opt-in, default off). These tests pin the new
invariants: every vector appears in exactly 1+spill posting lists, search
results never contain duplicate ids, and the spill flag round-trips through
persistence.
"""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex, load_index_from
from vector_indexer_tpu.storage import VectorStore


def _store(data):
    return VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )


@pytest.fixture(scope="module")
def spilled():
    g = np.random.default_rng(7)
    data = g.normal(0, 1, (4000, 32)).astype(np.float32)
    return IvfIndex.fit(_store(data), seed=7, spill=1), data


def test_spill_doubles_posting_rows(spilled):
    idx, data = spilled
    n = len(data)
    lengths = np.asarray(idx.layout.lengths)
    assert lengths.sum() == 2 * n
    # Every internal id appears exactly twice in the layout.
    perm = idx.layout.perm
    counts = np.bincount(perm[perm >= 0], minlength=n)
    assert (counts == 2).all()
    assert idx.layout.n == n  # n stays the distinct-vector count


def test_spill_secondary_differs_from_primary(spilled):
    idx, data = spilled
    # Reconstruct per-entry cluster ids from the layout; the two entries of
    # each vector must sit in different clusters (SOAR excludes the primary).
    starts = np.asarray(idx.layout.offsets)[:-1]
    lengths = np.asarray(idx.layout.lengths)
    cells = {}
    for c in range(idx.num_clusters):
        for iid in idx.layout.perm[starts[c] : starts[c] + lengths[c]]:
            cells.setdefault(int(iid), []).append(c)
    assert all(len(v) == 2 and v[0] != v[1] for v in cells.values())


@pytest.mark.parametrize("method", ["gather", "dense", "stream", "flat"])
def test_spill_no_duplicate_result_ids(spilled, method):
    idx, data = spilled
    D, I = idx.search_batch(data[:32], k=10, n_probe=idx.num_clusters,
                            method=method)
    for row in I:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real), method
    # Probing everything must recover the self-hit with exact distance.
    assert (I[:, 0] == np.arange(32)).all(), method
    assert (D[:, 0] < 1e-3).all(), method


def test_spill_full_probe_matches_unspilled_exact():
    g = np.random.default_rng(11)
    data = g.normal(0, 1, (2000, 16)).astype(np.float32)
    base = IvfIndex.fit(_store(data), seed=11)
    sp = IvfIndex.fit(_store(data), seed=11, spill=1)
    q = data[:16] + 0.01
    Db, Ib = base.search_batch(q, 10, base.num_clusters, method="gather")
    Ds, Is = sp.search_batch(q, 10, sp.num_clusters, method="gather")
    np.testing.assert_array_equal(Ib, Is)
    np.testing.assert_allclose(Db, Ds, rtol=1e-5, atol=1e-5)


def test_spill_recall_at_fixed_nprobe(spilled):
    # The point of spilling: materially higher recall at the same nprobe on
    # isotropic data. (Same data/seed, spill off vs on.)
    idx, data = spilled
    base = IvfIndex.fit(_store(data), seed=7)
    g = np.random.default_rng(3)
    q = g.normal(0, 1, (128, 32)).astype(np.float32)
    gt = np.argmin(
        ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1), axis=1
    )
    n_probe = max(2, idx.num_clusters // 16)
    _, I0 = base.search_batch(q, 10, n_probe, method="gather")
    _, I1 = idx.search_batch(q, 10, n_probe, method="gather")
    r0 = (I0 == gt[:, None]).any(1).mean()
    r1 = (I1 == gt[:, None]).any(1).mean()
    assert r1 >= r0 + 0.05, (r0, r1)


def test_spill_persistence_roundtrip(spilled, tmp_path):
    idx, data = spilled
    idx.save_to(tmp_path / "index", tmp_path / "shards")
    loaded = load_index_from(tmp_path / "index", tmp_path / "shards")
    assert loaded.spill == 1
    assert np.asarray(loaded.layout.lengths).sum() == 2 * len(data)
    q = data[:16]
    Da, Ia = idx.search_batch(q, 5, 8)
    Db, Ib = loaded.search_batch(q, 5, 8)
    np.testing.assert_array_equal(Ia, Ib)
    np.testing.assert_allclose(Da, Db, rtol=1e-5, atol=1e-5)


def test_spill_wide_k_dedup_branch(spilled):
    # kk = 2k > 512 exercises the sort-based dedup path; same contract.
    idx, data = spilled
    D, I = idx.search_batch(data[:8], k=300, n_probe=idx.num_clusters)
    for row in I:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    assert (I[:, 0] == np.arange(8)).all()
    assert (np.diff(D[np.isfinite(D).all(1)], axis=1) >= -1e-6).all()


def test_spill_metrics_ip_cosine():
    # Spill assignment always runs on the (normalized-for-cosine) corpus
    # with L2 cell geometry — consistent with probe-time L2 cell selection.
    g = np.random.default_rng(13)
    data = g.normal(0, 1, (1500, 16)).astype(np.float32)
    for metric in ("ip", "cosine"):
        idx = IvfIndex.fit(_store(data), seed=13, metric=metric, spill=1)
        D, I = idx.search_batch(data[:16], 5, idx.num_clusters)
        base = IvfIndex.fit(_store(data), seed=13, metric=metric)
        Db, Ib = base.search_batch(data[:16], 5, base.num_clusters)
        for a, b in zip(I, Ib):
            assert set(a.tolist()) == set(b.tolist()), metric
        for row in I:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real), metric


def test_spill_clustered_data_consistency():
    # On well-separated clusters spill must not hurt: same result sets as
    # the unspilled index at full probe, self-hits at small probe.
    data, _, _ = make_gaussian_clusters(10, 200, 24, spread=0.4, separation=8.0)
    idx = IvfIndex.fit(_store(data), seed=5, spill=1)
    D, I = idx.search_batch(data[:32], 5, 4)
    assert (I[:, 0] == np.arange(32)).all()
