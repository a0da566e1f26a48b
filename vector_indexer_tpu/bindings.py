"""Numpy-first bindings surface: build / load / suggest_nlist / VectorIndex.

Parity with the reference's Python bindings
(/root/reference/bindings/python/src/lib.rs and
/root/reference/bindings/python/python/vector_indexer_py/__init__.py):

  * ``build(xb, work_dir)``: one-shot build from an (n, d) f32 array,
    external_id = row index (lib.rs:220-280);
  * ``load(index_dir, shards_dir, dim)`` (lib.rs:292-304);
  * ``suggest_nlist(n)`` (lib.rs:308-315);
  * ``VectorIndex.search(xq, k, n_probe)`` (asyncio) and ``search_sync``
    returning ``(D, I)`` float32/int64 arrays of shape (nq, k), padded with
    +inf / -1 (lib.rs:123-203).

The reference needs a dedicated tokio-uring worker thread and crossbeam
channels because its async runtime is thread-local; here the jitted search
program is already asynchronous on device, so the bindings are direct calls
— and queries inside a batch run as ONE device program instead of the
reference's sequential per-query loop (lib.rs:74-97).
"""

from __future__ import annotations

import asyncio
import os
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .api import VectorIndexer, VectorIndexerConfig
from .utils.heuristics import suggest_nlist

__all__ = ["build", "load", "suggest_nlist", "VectorIndex"]


class VectorIndex:
    """Batched query handle over a built/loaded index."""

    def __init__(self, indexer: VectorIndexer):
        self._indexer = indexer

    @property
    def d(self) -> int:
        return self._indexer.cfg.dimension

    @property
    def nlist(self) -> int:
        return self._indexer.index.num_clusters

    def search_sync(
        self, xq: np.ndarray, k: int, n_probe: int, method: str = "auto"
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(nq, d) -> (D (nq, k) f32, I (nq, k) i64 external ids; pads +inf/-1)."""
        xq = np.ascontiguousarray(xq, dtype=np.float32)
        if xq.ndim == 1:
            xq = xq[None, :]
        return self._indexer.search_batch(xq, k=k, n_probe=n_probe, method=method)

    # Back-compat alias for the reference's blocking entry point name.
    search_blocking = search_sync

    def search_device(self, xq, k: int, n_probe: int, method: str = "auto"):
        """Device-resident search: returns (D, layout_rows) as jax arrays with
        NO device->host transfer — the serving/bench hot path. Accepts
        pre-staged device queries (see ``stage_queries``); use ``search_sync``
        for host numpy results with external ids."""
        import jax

        if not isinstance(xq, jax.Array):
            xq = np.ascontiguousarray(xq, dtype=np.float32)
            if xq.ndim == 1:
                xq = xq[None, :]
        idx = self._indexer.index
        cfg = self._indexer.cfg
        return idx.search_batch_device(
            xq, min(k, cfg.max_k), min(n_probe, cfg.max_n_probe), method
        )

    def stage_queries(self, xq, pad_to: int = 512):
        """Transfer a query batch to device HBM once; pass the handle to
        ``search_device`` to keep repeated searches free of h2d traffic.
        Rows are padded to a tile-aligned multiple (zero rows) so the hot
        loop dispatches the search program alone."""
        import jax.numpy as jnp

        xq = np.ascontiguousarray(xq, dtype=np.float32)
        if pad_to > 1:
            n = xq.shape[0]
            n_pad = -(-n // pad_to) * pad_to
            if n_pad != n:
                xq = np.concatenate(
                    [xq, np.zeros((n_pad - n, xq.shape[1]), np.float32)]
                )
        return jnp.asarray(xq)

    def offload(self, stream_dtype=None, rerank: str = "host") -> None:
        """Larger-than-HBM mode: free the f32 main table, serve from a
        compact (int8 by default) stream table with exact host re-rank
        (rerank='host') or device-throughput quantized ranking
        (rerank='none'). See IvfIndex.offload_main_table."""
        self._indexer.index.offload_main_table(stream_dtype, rerank=rerank)

    def rows_to_external(self, rows) -> np.ndarray:
        """Map device layout rows (from search_device) to external ids."""
        idx = self._indexer.index
        rows = np.asarray(rows)
        bound = max(idx.layout.rows_used - 1, 0)
        internal = np.where(
            rows >= 0, idx.layout.perm[np.clip(rows, 0, bound)], -1
        )
        return np.where(
            internal >= 0,
            idx.external_ids[np.clip(internal, 0, None)].astype(np.int64),
            -1,
        )

    async def search(
        self, xq: np.ndarray, k: int, n_probe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, self.search_sync, xq, k, n_probe)


def _default_work_dir() -> Path:
    return Path(tempfile.gettempdir()) / "vector_indexer_tpu"


def build(
    xb: np.ndarray,
    work_dir: Optional[str] = None,
    metric: str = "l2",
    spill: int = 0,
) -> VectorIndex:
    """Build an index from an (n, d) float32 array; external_id = row index.

    ``spill=1`` adds a SOAR secondary assignment per vector (higher
    recall-per-probe on hard data, 2x posting rows; results de-duplicated)."""
    xb = np.ascontiguousarray(xb, dtype=np.float32)
    if xb.ndim != 2 or xb.shape[0] == 0:
        raise ValueError("xb must be a non-empty (n, d) array")
    wd = Path(work_dir) if work_dir else _default_work_dir()
    cfg = (
        VectorIndexerConfig(xb.shape[1], metric=metric, spill=spill)
        .with_index_dir(wd / "index")
        .with_shards_dir(wd / "shards")
    )
    os.makedirs(cfg.index_dir, exist_ok=True)
    os.makedirs(cfg.shards_dir, exist_ok=True)
    indexer = VectorIndexer(cfg).build_from_arrays(xb)
    return VectorIndex(indexer)


def load(
    index_dir: str, shards_dir: str, dim: int, resident: str = "device"
) -> VectorIndex:
    """``resident='host'`` serves an unbounded corpus from host RAM via
    per-batch probed-cell staging (see IvfIndex.to_host_resident);
    ``resident='offload'`` serves larger-than-HBM corpora at device
    throughput from a host-quantized int8 stream table (see
    IvfIndex.offload_from_host)."""
    cfg = (
        VectorIndexerConfig(dim)
        .with_index_dir(index_dir)
        .with_shards_dir(shards_dir)
    )
    return VectorIndex(VectorIndexer.load(cfg, resident=resident))
