"""Faiss-like adapter tests (parity: vector_indexer_adapter.py surface)."""

import numpy as np

from benchmarks.adapter import FaissLikeIndex, build_adapter


def test_adapter_surface(tmp_path):
    g = np.random.default_rng(1)
    xb = g.normal(size=(400, 16)).astype(np.float32)
    ad = build_adapter(xb, work_dir=str(tmp_path), nprobe=8)
    assert isinstance(ad, FaissLikeIndex)
    assert ad.d == 16
    assert ad.ntotal == 400
    assert ad.nlist >= 1
    D, I = ad.search(xb[:5], 3)
    assert D.shape == (5, 3) and I.shape == (5, 3)
    assert (I[:, 0] == np.arange(5)).all()
    # nprobe is a mutable property like faiss.
    ad.nprobe = ad.nlist
    D2, I2 = ad.search(xb[:5], 3)
    assert (I2[:, 0] == np.arange(5)).all()
