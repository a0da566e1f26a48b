"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

from vector_indexer_tpu.ops.pallas import assign_argmin_pallas


def _np_assign(x, c):
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), d.min(1)


@pytest.mark.parametrize("n,k,d", [(100, 7, 16), (300, 520, 24), (257, 512, 128)])
def test_assign_matches_numpy(rng, n, k, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    c = rng.normal(size=(k, d)).astype(np.float32)
    labels, dists = assign_argmin_pallas(x, c, interpret=True)
    want_l, want_d = _np_assign(x, c)
    np.testing.assert_array_equal(np.asarray(labels), want_l)
    np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-4, atol=1e-4)


def test_assign_single_centroid(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    c = rng.normal(size=(1, 8)).astype(np.float32)
    labels, _ = assign_argmin_pallas(x, c, interpret=True)
    assert (np.asarray(labels) == 0).all()


def test_assign_exact_hits(rng):
    c = rng.normal(size=(20, 12)).astype(np.float32) * 10
    x = c[[3, 7, 19]]
    labels, dists = assign_argmin_pallas(x, c, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), [3, 7, 19])
    assert (np.asarray(dists) < 1e-2).all()
