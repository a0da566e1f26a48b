"""Multi-host (DCN) sharded search: a 'hosts' mesh axis over 'shards'.

Corpora beyond one pod's HBM shard across hosts (ROADMAP #8; SURVEY §5
long-axis scaling). The design point is the merge topology: chips inside
a host are linked by ICI (fast), hosts by DCN (slow), so the top-k merge
is hierarchical — stage 1 ``all_gather``s the S per-chip partial top-ks
over the intra-host ICI ring and fuses a per-host top-k; stage 2
``all_gather``s only each host's fused list over DCN. A flat merge over
all H*S devices would move S times more bytes over the slow hop.

Table placement is host-major: shard h*S+s lives on mesh position
(host=h, shard=s), i.e. one contiguous corpus stripe per host — the
layout a per-host filesystem or object-store prefix would load.

The reference has no multi-host story (single-process shard fan-out,
/root/reference/src/ivf_index.rs:228-249); this extends it along the
same two-level structure its shard map implies.

On this environment the 'hosts' axis is validated on the virtual CPU
mesh (the collectives are identical; only the wire underneath differs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import (
    _dedup_host,
    _fine_metric,
    _ici_merge,
    _make_per_device,
    _make_per_device_stream,
    _merge_carry_payload,
    _normalize_cosine,
    _round_up,
    _stream_slots,
    build_local_stream_tables,
    build_local_tables,
    choose_local_body,
)


def _make_hier_merge(host_axis, shard_axis, H, S, k):
    """Hierarchical merge closure for a per-device body: stage 1 fuses the
    S chip-local top-ks over the intra-host ICI ring; stage 2 moves only
    each host's fused list over DCN, carrying flat host-major owner ids."""

    def hier_merge(dloc, rloc, nq):
        d1, r1, dev1 = _ici_merge(dloc, rloc, shard_axis, S, nq, k)
        my_host = jax.lax.axis_index(host_axis)
        flat = jnp.where(dev1 >= 0, my_host * S + dev1, -1)
        return _merge_carry_payload(d1, r1, flat, host_axis, H, nq, k)

    return hier_merge


def make_mesh_hosts(
    n_hosts: int, shards_per_host: int, host_axis: str = "hosts",
    shard_axis: str = "shards",
) -> Mesh:
    devices = jax.devices()
    need = n_hosts * shards_per_host
    if need > len(devices):
        raise ValueError(
            f"requested {need} devices but only {len(devices)} available"
        )
    grid = np.array(devices[:need]).reshape(n_hosts, shards_per_host)
    return Mesh(grid, (host_axis, shard_axis))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "host_axis", "shard_axis", "k", "probe_bound",
                     "fused_plan", "interpret", "metric"),
)
def _multihost_search_program(
    mesh,
    host_axis,
    shard_axis,
    queries,  # (nq, d) replicated
    centroids,  # (kc, d) replicated — GLOBAL coarse table
    c_sq,  # (kc,) replicated
    local_vecs,  # (H*S, rows, d) sharded host-major over both axes
    local_norms,
    local_cent,
    local_csq,
    local_run_starts_b,
    n_probe,  # () int32 traced (within the static probe_bound)
    *,
    k: int,
    probe_bound: int,
    fused_plan=None,  # (w, q_tile, c_groups) -> fused Pallas local sweep
    interpret: bool = False,
    metric: str = "l2",
):
    from jax import shard_map

    H = mesh.shape[host_axis]
    S = mesh.shape[shard_axis]
    per_device = _make_per_device(
        centroids, c_sq, n_probe, k, shard_axis, S, probe_bound,
        merge_fn=_make_hier_merge(host_axis, shard_axis, H, S, k),
        fused_plan=fused_plan, interpret=interpret, metric=metric,
    )
    both = P((host_axis, shard_axis))
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), both, both, both, both, both),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        local_run_starts_b,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "host_axis", "shard_axis", "k", "probe_bound", "t_fixed",
        "q_tile", "chunk", "metric", "rerank", "interpret",
    ),
)
def _multihost_stream_program(
    mesh,
    host_axis,
    shard_axis,
    queries,  # (nq_pad, d) replicated; nq_pad % q_tile == 0
    centroids,
    c_sq,
    local_vecs,
    local_norms,
    local_cent,
    local_csq,
    svecs,  # stream-table arrays, host-major sharded over both axes
    snorms,
    sto_local,
    sblk0,
    slen,
    blk_cid,
    scales,
    n_probe,  # () i32 traced
    *,
    k: int,
    probe_bound: int,
    t_fixed: int,
    q_tile: int,
    chunk: int,
    metric: str,
    rerank: bool,
    interpret: bool,
):
    from jax import shard_map

    H = mesh.shape[host_axis]
    S = mesh.shape[shard_axis]
    per_device = _make_per_device_stream(
        centroids, c_sq, n_probe, k, shard_axis, S, probe_bound,
        t_fixed, q_tile, chunk, metric, rerank, interpret,
        merge_fn=_make_hier_merge(host_axis, shard_axis, H, S, k),
    )
    both = P((host_axis, shard_axis))
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(),) + (both,) * 11,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        svecs, snorms, sto_local, sblk0, slen, blk_cid, scales,
    )


class MultiHostSearcher:
    """Hierarchically-merged search over a (hosts, shards) mesh.

    ``method``: 'dense' (masked local sweep), 'stream' (probed-blocks
    Pallas sweep of per-device stream tables) or 'auto' (the 1-D
    searcher's local byte model)."""

    def __init__(self, index, mesh: Mesh, host_axis: str = "hosts",
                 shard_axis: str = "shards", method: str = "auto"):
        if method not in ("auto", "dense", "dense_fused", "stream"):
            raise ValueError(f"unknown multihost search method: {method}")
        self.mesh = mesh
        self.host_axis = host_axis
        self.shard_axis = shard_axis
        self.index = index
        self.method = method
        n_dev = mesh.shape[host_axis] * mesh.shape[shard_axis]
        self.n_dev = n_dev

        t = build_local_tables(index, n_dev)
        self._host_tables = t
        self.shard_to_dev = t.shard_to_dev
        self.local_perm = t.local_perm

        both = NamedSharding(mesh, P((host_axis, shard_axis)))
        self._both = both
        self.local_vecs = jax.device_put(t.local_vecs, both)
        self.local_norms = jax.device_put(t.local_norms, both)
        self.local_cent = jax.device_put(t.local_cent, both)
        self.local_csq = jax.device_put(t.local_csq, both)
        self.local_run_starts_b = jax.device_put(t.local_run_starts_b, both)
        repl = NamedSharding(mesh, P())
        self.centroids = jax.device_put(t.cents, repl)
        self.c_sq = jax.device_put(t.c_sq, repl)
        self._stream = None  # built lazily on first stream call

    def _stream_tables(self):
        if self._stream is None:
            st = build_local_stream_tables(
                self._host_tables, self.index.stream_dtype
            )
            self._stream = {
                k: (jax.device_put(v, self._both)
                    if isinstance(v, np.ndarray) else v)
                for k, v in st.items()
            }
        return self._stream

    def _choose(self, nq: int, n_probe: int) -> str:
        if self.method != "auto":
            return self.method
        return choose_local_body(
            self.index, self._host_tables, n_probe, nq_local=nq
        )

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
                f"query dimension mismatch: expected "
                f"{self.index.dimension}, got {d}"
            )
        queries = _normalize_cosine(self.index, queries)
        kc = self.centroids.shape[0]
        n_probe = min(n_probe, kc)
        spill = getattr(self.index, "spill", 0)
        kk = (1 + spill) * k

        from ..ops.gather import quantize_up

        probe_bound = min(quantize_up(max(n_probe, 1)), kc)
        method = self._choose(nq, n_probe)
        if method == "stream":
            from ..ops.pallas.block_stream import SMEM_TASK_CAP
            from ..index.ivf import _stream_rerank_wanted as _rr

            st = self._stream_tables()
            exactish = jnp.dtype(self.index.stream_dtype) == jnp.float32
            t_fixed = _stream_slots(
                self._host_tables.local_lengths, probe_bound, st["chunk"]
            )
            q_tile = max(
                8, min(256, (SMEM_TASK_CAP // max(t_fixed, 1)) // 8 * 8)
            )
            q_tile = min(q_tile, _round_up(nq, 8))
            nq_pad = _round_up(nq, q_tile)
            qp = np.zeros((nq_pad, d), np.float32)
            qp[:nq] = queries
            D, rows, devs = _multihost_stream_program(
                self.mesh,
                self.host_axis,
                self.shard_axis,
                jnp.asarray(qp),
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
                metric=self.index.metric
                if self.index.metric != "cosine"
                else "ip",
                rerank=not exactish
                and _rr(self.index.stream_dtype),
                interpret=jax.default_backend() == "cpu",
            )
        else:
            fused_plan = None
            q_align = 8
            if method == "dense_fused" and d % 128 == 0:
                from ..ops.pallas.flat_sweep import plan_fused

                rows_local = self._host_tables.local_vecs.shape[1]
                fused_plan = plan_fused(rows_local, d, nq, kk)
                if fused_plan is not None:
                    q_align = fused_plan[1]
            nq_pad = _round_up(nq, q_align)
            qp = np.zeros((nq_pad, d), np.float32)
            qp[:nq] = queries
            D, rows, devs = _multihost_search_program(
                self.mesh,
                self.host_axis,
                self.shard_axis,
                jnp.asarray(qp),
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
                fused_plan=fused_plan,
                interpret=jax.default_backend() == "cpu",
                metric=_fine_metric(self.index),
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
