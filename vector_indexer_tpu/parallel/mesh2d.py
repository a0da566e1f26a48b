"""2-D mesh search: query-parallel x shard-parallel.

Scaling both axes at once (survey §2c-4/6): posting shards partition HBM
across the ``shards`` mesh axis (the expert/data-placement axis), while the
query batch splits across the ``queries`` axis (data parallelism). Each
device searches its query slice against its shard slice; the top-k merge
``all_gather`` runs over the ``shards`` axis only — queries never talk to
each other, so the collective rides the inner (fastest) ICI ring.

On an (Q, S) mesh this multiplies single-chip throughput by ~Q while
dividing per-chip HBM footprint by S — the pod-level serving layout.

Tables are built host-side from the index's host mirror and device_put
straight onto the 2-D mesh (shard dim -> shard_axis, replicated over
q_axis): construction performs zero corpus-sized d2h fetches and stages
each array exactly once.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import _dedup_host, _round_up, build_local_tables


def make_mesh_2d(
    q_devices: int, shard_devices: int, q_axis: str = "queries",
    shard_axis: str = "shards"
) -> Mesh:
    devices = jax.devices()
    need = q_devices * shard_devices
    if need > len(devices):
        raise ValueError(
            f"requested {need} devices but only {len(devices)} available"
        )
    grid = np.array(devices[:need]).reshape(q_devices, shard_devices)
    return Mesh(grid, (q_axis, shard_axis))


class Sharded2DSearcher:
    """Query x shard parallel search over a 2-D mesh.

    ``method``: 'dense' (default; masked XLA sweep per device),
    'dense_fused' (fused Pallas local sweep, same plan/loss gate and XLA
    fallback as the 1-D searcher) or 'stream' (probed-blocks Pallas sweep
    of per-device stream tables)."""

    def __init__(self, index, mesh: Mesh, q_axis: str = "queries",
                 shard_axis: str = "shards", method: str = "dense"):
        if method not in ("auto", "dense", "dense_fused", "stream"):
            raise ValueError(f"unknown 2-D search method: {method}")
        self.method = method
        self.mesh = mesh
        self.q_axis = q_axis
        self.shard_axis = shard_axis
        self.index = index
        t = build_local_tables(index, mesh.shape[shard_axis])
        self._host_tables = t
        self._rows_local = t.local_vecs.shape[1]

        sh = NamedSharding(mesh, P(shard_axis))  # replicated over q_axis
        self._shard_sharding = sh
        self.local_vecs = jax.device_put(t.local_vecs, sh)
        self.local_norms = jax.device_put(t.local_norms, sh)
        self.local_cent = jax.device_put(t.local_cent, sh)
        self.local_csq = jax.device_put(t.local_csq, sh)
        self.local_run_starts_b = jax.device_put(t.local_run_starts_b, sh)
        repl = NamedSharding(mesh, P())
        self.centroids = jax.device_put(t.cents, repl)
        self.c_sq = jax.device_put(t.c_sq, repl)
        self.local_perm = t.local_perm
        self.shard_to_dev = t.shard_to_dev
        self._stream = None  # built lazily on first stream call

    def _stream_tables(self):
        if self._stream is None:
            from .sharded import build_local_stream_tables

            st = build_local_stream_tables(
                self._host_tables, self.index.stream_dtype
            )
            self._stream = {
                k: (jax.device_put(v, self._shard_sharding)
                    if isinstance(v, np.ndarray) else v)
                for k, v in st.items()
            }
        return self._stream

    def search_batch(
        self, queries: np.ndarray, k: int, n_probe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        if k <= 0:
            raise ValueError("k must be > 0")
        if n_probe <= 0:
            raise ValueError("n_probe must be > 0")
        queries = np.ascontiguousarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, d = queries.shape
        if d != self.index.dimension:
            raise ValueError(
                f"query dimension mismatch: expected {self.index.dimension}, got {d}"
            )
        from .sharded import _fine_metric, _normalize_cosine

        queries = _normalize_cosine(self.index, queries)
        kc = self.centroids.shape[0]
        n_probe = min(n_probe, kc)
        spill = getattr(self.index, "spill", 0)
        kk = (1 + spill) * k
        nq_dev = self.mesh.shape[self.q_axis]

        import jax.numpy as jnp

        from ..ops.gather import quantize_up
        from .sharded import choose_local_body

        probe_bound = min(quantize_up(max(n_probe, 1)), kc)
        method = self.method
        if method == "auto":
            # Query-parallel axis: each device sees only its query slice.
            method = choose_local_body(
                self.index, self._host_tables, n_probe,
                nq_local=max(1, -(-nq // nq_dev)),
            )
        if method == "stream":
            from ..ops.pallas.block_stream import SMEM_TASK_CAP
            from ..index.ivf import _stream_rerank_wanted as _rr
            from .sharded import (
                _fine_metric as _fm,
                _sharded_stream_program_2d,
                _stream_slots,
            )

            st = self._stream_tables()
            exactish = jnp.dtype(self.index.stream_dtype) == jnp.float32
            t_fixed = _stream_slots(
                self._host_tables.local_lengths, probe_bound, st["chunk"]
            )
            q_tile = max(
                8, min(256, (SMEM_TASK_CAP // max(t_fixed, 1)) // 8 * 8)
            )
            q_tile = min(q_tile, _round_up(max(1, nq // nq_dev), 8))
            nq_pad = _round_up(nq, q_tile * nq_dev)
            qp = np.zeros((nq_pad, d), np.float32)
            qp[:nq] = queries
            D, rows, devs = _sharded_stream_program_2d(
                self.mesh,
                self.q_axis,
                self.shard_axis,
                jax.device_put(
                    jnp.asarray(qp),
                    NamedSharding(self.mesh, P(self.q_axis)),
                ),
                self.centroids,
                self.c_sq,
                self.local_vecs,
                self.local_norms,
                self.local_cent,
                self.local_csq,
                st["svecs"],
                st["snorms"],
                st["sto_local"],
                st["sblk0"],
                st["slen"],
                st["blk_cid"],
                st["scales"],
                jnp.int32(n_probe),
                k=kk,
                probe_bound=probe_bound,
                t_fixed=t_fixed,
                q_tile=q_tile,
                chunk=st["chunk"],
                metric=_fm(self.index),
                rerank=not exactish
                and _rr(self.index.stream_dtype),
                interpret=jax.default_backend() == "cpu",
            )
            D = np.asarray(D)[:nq]
            rows = np.asarray(rows)[:nq]
            devs = np.asarray(devs)[:nq]
            internal = np.where(
                rows >= 0,
                self.local_perm[
                    np.clip(devs, 0, None), np.clip(rows, 0, None)
                ],
                -1,
            )
            if spill:
                internal, D = _dedup_host(internal, D)
            return D[:, :k], internal[:, :k]

        fused_plan = None
        q_align = 8
        if method == "dense_fused" and d % 128 == 0:
            from ..ops.pallas.flat_sweep import plan_fused

            rows_local = self._rows_local
            # Each device sees its nq/Q query slice.
            fused_plan = plan_fused(
                rows_local, d, max(1, nq // nq_dev), kk
            )
            if fused_plan is not None:
                q_align = fused_plan[1]  # per-device slice tiles the grid
        nq_pad = _round_up(nq, q_align * nq_dev)
        qp = np.zeros((nq_pad, d), np.float32)
        qp[:nq] = queries

        from .sharded import _sharded_search_program_2d

        D, rows, devs = _sharded_search_program_2d(
            self.mesh,
            self.q_axis,
            self.shard_axis,
            jax.device_put(
                jnp.asarray(qp), NamedSharding(self.mesh, P(self.q_axis))
            ),
            self.centroids,
            self.c_sq,
            self.local_vecs,
            self.local_norms,
            self.local_cent,
            self.local_csq,
            self.local_run_starts_b,
            jnp.int32(n_probe),
            k=kk,
            probe_bound=probe_bound,
            metric=_fine_metric(self.index),
            fused_plan=fused_plan,
            interpret=jax.default_backend() == "cpu",
        )
        D = np.asarray(D)[:nq]
        rows = np.asarray(rows)[:nq]
        devs = np.asarray(devs)[:nq]
        internal = np.where(
            rows >= 0,
            self.local_perm[np.clip(devs, 0, None), np.clip(rows, 0, None)],
            -1,
        )
        if spill:
            internal, D = _dedup_host(internal, D)
        return D[:, :k], internal[:, :k]
