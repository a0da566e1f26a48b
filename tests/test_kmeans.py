"""K-means engine tests.

Ports the behavioral contract of /root/reference/tests/kmeans_tests.rs:
shape/bounds invariants, convergence to locally-optimal assignments, quality
floors on separated Gaussians, mini-batch vs full-batch parity, hierarchical
path correctness, graceful degenerate inputs. Statistical (not bitwise)
determinism, as in the reference's own stability tests.
"""

import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.models import (
    assign_points,
    assign_points_hierarchical,
    compute_inertia,
    kmeans_plus_plus_init,
    run_kmeans_lloyd,
    run_kmeans_mini_batch,
)


def _verify_optimal_assignment(data, centroids, labels, eps=1e-4):
    """Every point's assigned centroid is (within eps) its nearest one."""
    d = ((data[:, None, :] - np.asarray(centroids)[None, :, :]) ** 2).sum(-1)
    best = d.min(1)
    got = d[np.arange(len(data)), np.asarray(labels)]
    assert (got <= best + eps + 1e-6 * np.abs(best)).all()


def test_shapes_and_label_bounds(rng):
    data = rng.normal(size=(500, 16)).astype(np.float32)
    res = run_kmeans_lloyd(data, k=8, max_iters=50)
    assert res.centroids.shape == (8, 16)
    assert res.labels.shape == (500,)
    lbl = np.asarray(res.labels)
    assert lbl.min() >= 0 and lbl.max() < 8


def test_converged_assignment_is_optimal(rng):
    data = rng.normal(size=(400, 8)).astype(np.float32)
    res = run_kmeans_lloyd(data, k=5, max_iters=100)
    _verify_optimal_assignment(data, res.centroids, res.labels)


def test_k1_centroid_is_mean(rng):
    data = rng.normal(size=(300, 12)).astype(np.float32)
    res = run_kmeans_lloyd(data, k=1, max_iters=20)
    np.testing.assert_allclose(
        np.asarray(res.centroids)[0], data.mean(0), rtol=1e-3, atol=1e-3
    )


def test_k_equals_n_and_k_greater_than_n(rng):
    data = rng.normal(size=(10, 4)).astype(np.float32)
    for k in (10, 15):
        res = run_kmeans_lloyd(data, k=k, max_iters=10)
        assert res.centroids.shape == (k, 4)
        lbl = np.asarray(res.labels)
        assert lbl.min() >= 0 and lbl.max() < k


def test_high_dim_1536(rng):
    data = rng.normal(size=(200, 1536)).astype(np.float32)
    res = run_kmeans_lloyd(data, k=4, max_iters=20)
    assert res.centroids.shape == (4, 1536)
    assert np.isfinite(np.asarray(res.centroids)).all()


def test_identical_points(rng):
    data = np.ones((100, 8), dtype=np.float32) * 3.5
    res = run_kmeans_lloyd(data, k=3, max_iters=20)
    assert np.isfinite(np.asarray(res.centroids)).all()
    # All centroids with members must equal the single point.
    lbl = np.asarray(res.labels)
    for c in np.unique(lbl):
        np.testing.assert_allclose(np.asarray(res.centroids)[c], 3.5, atol=1e-4)


def test_inertia_improves_with_iterations(rng):
    data, _, _ = make_gaussian_clusters(8, 100, 16, spread=1.0, separation=4.0)
    r1 = run_kmeans_lloyd(data, k=8, max_iters=1, early_stop_threshold=0.0)
    r2 = run_kmeans_lloyd(data, k=8, max_iters=50, early_stop_threshold=0.0)
    i1 = compute_inertia(data, r1.centroids, r1.labels)
    i2 = compute_inertia(data, r2.centroids, r2.labels)
    assert i2 <= i1 * 1.01


@pytest.mark.parametrize("trainer", [run_kmeans_lloyd, run_kmeans_mini_batch])
def test_stability_across_seeds(trainer):
    data, _, _ = make_gaussian_clusters(6, 150, 8, spread=0.3, separation=8.0)
    inertias = []
    for seed in (1, 2, 3):
        res = trainer(data, k=6, max_iters=100, seed=seed)
        inertias.append(compute_inertia(data, res.centroids, res.labels))
    assert max(inertias) / max(min(inertias), 1e-12) < 1.2


def test_cluster_recovery_on_separated_gaussians():
    data, true_labels, centers = make_gaussian_clusters(
        5, 200, 16, spread=0.1, separation=12.0
    )
    res = run_kmeans_lloyd(data, k=5, max_iters=100)
    # Each found centroid should be within spread of some true center.
    c = np.asarray(res.centroids)
    d = ((c[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assert (d.min(1) < 1.0).all()
    # Each true cluster maps to exactly one found centroid (purity).
    lbl = np.asarray(res.labels)
    for t in range(5):
        vals, counts = np.unique(lbl[true_labels == t], return_counts=True)
        assert counts.max() / counts.sum() > 0.95


def test_mini_batch_quality_vs_full_batch():
    data, _, _ = make_gaussian_clusters(8, 200, 16, spread=0.5, separation=6.0)
    full = run_kmeans_lloyd(data, k=8, max_iters=100)
    mini = run_kmeans_mini_batch(data, k=8, max_iters=100)
    i_full = compute_inertia(data, full.centroids, full.labels)
    i_mini = compute_inertia(data, mini.centroids, mini.labels)
    assert i_mini <= i_full * 1.5  # parity bound (kmeans_tests.rs:541-579)


def test_mini_batch_k200_assignment_optimal(rng):
    # Parity with the reference's k=200 hierarchical-trigger test
    # (kmeans_tests.rs:628-649): large k still yields optimal labels.
    data = rng.normal(size=(2000, 8)).astype(np.float32)
    res = run_kmeans_mini_batch(data, k=200, max_iters=30)
    _verify_optimal_assignment(data, res.centroids, res.labels)


def test_hierarchical_assignment_quality(rng):
    data, _, _ = make_gaussian_clusters(16, 100, 8, spread=0.2, separation=10.0)
    res = run_kmeans_lloyd(data, k=16, max_iters=50)
    dense_lbl, dense_d = assign_points(data, res.centroids, method="dense")
    hier_lbl, hier_d = assign_points_hierarchical(data, res.centroids)
    # Hierarchical probes top-3 meta groups; on well-separated data it must
    # agree with dense for nearly all points.
    agree = (np.asarray(dense_lbl) == np.asarray(hier_lbl)).mean()
    assert agree > 0.99
    assert (np.asarray(hier_d) >= -1e-6).all()


def test_empty_data_error():
    with pytest.raises(ValueError):
        run_kmeans_lloyd(np.zeros((0, 8), np.float32), k=3, max_iters=10)
    with pytest.raises(ValueError):
        run_kmeans_mini_batch(np.zeros((0, 8), np.float32), k=3, max_iters=10)


def test_determinism_same_seed(rng):
    data = rng.normal(size=(500, 8)).astype(np.float32)
    a = run_kmeans_mini_batch(data, k=10, max_iters=20, seed=7)
    b = run_kmeans_mini_batch(data, k=10, max_iters=20, seed=7)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_allclose(
        np.asarray(a.centroids), np.asarray(b.centroids), rtol=0, atol=0
    )


def test_kmeans_pp_init_spread(rng):
    data, _, _ = make_gaussian_clusters(4, 50, 8, spread=0.05, separation=20.0)
    init = np.asarray(kmeans_plus_plus_init(data, 4, seed=3))
    # k-means++ on well-separated blobs should pick one seed per blob.
    d = ((init[:, None, :] - init[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 10.0


def test_refine_iters_improves_balance():
    # Lloyd refinement after mini-batch must not hurt inertia and should
    # reduce cluster-size skew on isotropic data.
    rng = np.random.default_rng(11)
    data = rng.normal(size=(5000, 16)).astype(np.float32)
    base = run_kmeans_mini_batch(data, k=50, max_iters=30, seed=4)
    ref = run_kmeans_mini_batch(data, k=50, max_iters=30, seed=4, refine_iters=5)
    i_base = compute_inertia(data, base.centroids, base.labels)
    i_ref = compute_inertia(data, ref.centroids, ref.labels)
    assert i_ref <= i_base * 1.01
    skew_base = np.bincount(np.asarray(base.labels), minlength=50).max()
    skew_ref = np.bincount(np.asarray(ref.labels), minlength=50).max()
    assert skew_ref <= skew_base


def test_assign_points_pallas_dispatch(rng):
    """assign_points(method='pallas') routes to the fused kernel and agrees
    with the dense XLA path."""
    from vector_indexer_tpu.models.kmeans import assign_points

    x = rng.normal(size=(300, 24)).astype(np.float32)
    c = rng.normal(size=(10, 24)).astype(np.float32)
    l_d, d_d = assign_points(x, c, method="dense")
    l_p, d_p = assign_points(x, c, method="pallas")
    np.testing.assert_array_equal(np.asarray(l_d), np.asarray(l_p))
    np.testing.assert_allclose(np.asarray(d_d), np.asarray(d_p), rtol=1e-4, atol=1e-4)


def test_fast_iters_quality_parity(rng):
    """bf16-pass training iterations must not damage clustering quality:
    inertia within 5% of the exact-iteration run (final labels are exact
    either way)."""
    from vector_indexer_tpu.models.kmeans import run_kmeans_lloyd

    from conftest import make_gaussian_clusters

    data, _, _ = make_gaussian_clusters(10, 200, 24, spread=0.5, separation=6.0)
    fast = run_kmeans_lloyd(data, 10, 50, seed=5, fast_iters=True)
    exact = run_kmeans_lloyd(data, 10, 50, seed=5, fast_iters=False)
    i_fast = compute_inertia(data, fast.centroids, fast.labels)
    i_exact = compute_inertia(data, exact.centroids, exact.labels)
    assert i_fast <= i_exact * 1.05


def test_sampled_lloyd_quality_and_full_labels(rng):
    from vector_indexer_tpu.models import run_kmeans_lloyd_sampled

    data, _, _ = make_gaussian_clusters(8, 400, 16, spread=0.1,
                                        separation=15.0)
    res = run_kmeans_lloyd_sampled(data, k=8, max_iters=25,
                                   train_sample=800, seed=11)
    assert res.labels.shape == (len(data),)
    # Full-corpus labels are exact nearest-centroid even though training
    # saw only a quarter of the points.
    _verify_optimal_assignment(data, res.centroids, res.labels)
    # Well-separated blobs: sampled training still recovers every blob.
    inertia = compute_inertia(data, res.centroids, res.labels)
    assert inertia / len(data) < 1.0
    # Deterministic: same seed -> identical centroids and labels.
    res2 = run_kmeans_lloyd_sampled(data, k=8, max_iters=25,
                                    train_sample=800, seed=11)
    np.testing.assert_array_equal(np.asarray(res.labels),
                                  np.asarray(res2.labels))
    # sample >= n falls through to the unsampled trainer.
    full = run_kmeans_lloyd_sampled(data, k=8, max_iters=25,
                                    train_sample=10**9, seed=11)
    ref = run_kmeans_lloyd(data, k=8, max_iters=25, seed=11)
    np.testing.assert_array_equal(np.asarray(full.labels),
                                  np.asarray(ref.labels))
    with pytest.raises(ValueError):
        run_kmeans_lloyd_sampled(data, k=8, max_iters=5, train_sample=4)


def test_fit_train_sample_guardrails(rng):
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.storage import VectorStore

    data, _, _ = make_gaussian_clusters(6, 300, 16, spread=0.1,
                                        separation=12.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    idx = IvfIndex.fit(store, seed=3, train_sample=600)
    D, I = idx.search_batch(data[:32], 1, idx.num_clusters)
    assert (I[:, 0] == np.arange(32)).mean() > 0.95  # self-hit
    with pytest.raises(ValueError):
        IvfIndex.fit(store, seed=3, trainer="mini_batch", train_sample=600)
