"""Benchmark-harness tests: loaders, recall definition, GT recompute rule."""

import numpy as np
import pytest

from benchmarks import datasets, harness


def _write_fvecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, 1 + d), np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.float32).view(np.int32)
    out.tofile(path)


def _write_ivecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, 1 + d), np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.int32)
    out.tofile(path)


def test_fvecs_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(20, 7)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    _write_fvecs(p, arr)
    got = datasets.read_fvecs(p)
    np.testing.assert_array_equal(got, arr)
    got2 = datasets.read_fvecs(p, count=5)
    np.testing.assert_array_equal(got2, arr[:5])


def test_ivecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 1000, size=(15, 10)).astype(np.int32)
    p = str(tmp_path / "g.ivecs")
    _write_ivecs(p, arr)
    np.testing.assert_array_equal(datasets.read_ivecs(p), arr)


def test_synthetic_deterministic():
    a = datasets.synthetic(100, 8, 10, seed=3)
    b = datasets.synthetic(100, 8, 10, seed=3)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_recall_definition():
    gt = np.array([[5, 1, 2], [7, 8, 9]])
    I = np.array([[3, 5, 0], [1, 2, 3]])
    # true NN (gt[:,0]) in top-1? no/no. top-2? q0 yes (5 at rank 2), q1 no.
    assert harness.recall_at(I, gt, 1) == 0.0
    assert harness.recall_at(I, gt, 2) == 0.5
    assert harness.recall_at(I, gt, 3) == 0.5


def test_load_dataset_gt_recompute(tmp_path, rng):
    xb = rng.normal(size=(50, 6)).astype(np.float32)
    xq = xb[:4] + 0.001
    pb, pq, pg = (str(tmp_path / s) for s in ("b.fvecs", "q.fvecs", "g.ivecs"))
    _write_fvecs(pb, xb)
    _write_fvecs(pq, xq)
    # GT referencing ids beyond the slice -> must be recomputed.
    _write_ivecs(pg, np.full((4, 3), 49, np.int32))
    xb2, xq2, gt = datasets.load_dataset(pb, pq, pg, n=20, nq=4, k=3)
    assert xb2.shape == (20, 6)
    # Recomputed GT: each query's true NN is its own source row.
    np.testing.assert_array_equal(gt[:, 0], np.arange(4))


def test_load_dataset_valid_gt_kept(tmp_path, rng):
    xb = rng.normal(size=(30, 5)).astype(np.float32)
    xq = xb[:3]
    pb, pq, pg = (str(tmp_path / s) for s in ("b.fvecs", "q.fvecs", "g.ivecs"))
    _write_fvecs(pb, xb)
    _write_fvecs(pq, xq)
    marker = np.array([[0, 1], [1, 2], [2, 3]], np.int32)
    _write_ivecs(pg, marker)
    _, _, gt = datasets.load_dataset(pb, pq, pg, k=2)
    np.testing.assert_array_equal(gt, marker)
