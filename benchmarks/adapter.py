"""Faiss-compatible adapter: make the TPU index quack like a faiss index.

Parity with the reference's VectorIndexerFaissAdapter
(/root/reference/bench/faiss_bench_official/vector_indexer_adapter.py:75-143):
``.search(xq, k) -> (D, I)``, a settable ``.nprobe`` property, ``.d``,
``.ntotal`` — so existing faiss-based evaluation code can swap backends
without modification. The reference needs a dedicated asyncio-loop thread to
bridge its async bindings (AsyncLoopThread, adapter.py:20-72); here search is
natively synchronous-batched so the adapter is a direct pass-through.
"""

from __future__ import annotations

import numpy as np


class FaissLikeIndex:
    """Drop-in faiss-style facade over a built/loaded VectorIndex."""

    def __init__(self, index, nprobe: int = 20, method: str = "auto"):
        self._index = index
        self.nprobe = int(nprobe)
        self.method = method

    @property
    def d(self) -> int:
        return self._index.d

    @property
    def nlist(self) -> int:
        return self._index.nlist

    @property
    def ntotal(self) -> int:
        return self._index._indexer.index.layout.n

    def search(self, xq: np.ndarray, k: int):
        """(nq, d) -> (D (nq, k) f32, I (nq, k) i64), faiss contract
        (missing slots padded with +inf / -1)."""
        return self._index.search_sync(xq, k, self.nprobe, method=self.method)


def build_adapter(xb: np.ndarray, work_dir=None, nprobe: int = 20) -> FaissLikeIndex:
    from vector_indexer_tpu import bindings

    return FaissLikeIndex(bindings.build(xb, work_dir), nprobe=nprobe)


def load_adapter(
    index_dir: str, shards_dir: str, dim: int, nprobe: int = 20
) -> FaissLikeIndex:
    from vector_indexer_tpu import bindings

    return FaissLikeIndex(bindings.load(index_dir, shards_dir, dim), nprobe=nprobe)
