"""Multi-chip sharded IVF search: shard_map over a 'shards' mesh axis.

Design (survey §5.8): posting lists are partitioned across devices by shard
(clusters of one shard are contiguous rows of the layout, so a device slice
is a contiguous row range). Queries and the full centroid table are
replicated — the coarse quantizer is tiny. Each device:

  1. computes the GLOBAL probe threshold (the n_probe-th smallest coarse
     distance over all centroids — replicated compute, no communication;
     bounded top_k, not a full sort, so the cost scales with the probe
     bound rather than nlist);
  2. selects its LOCAL probed clusters (clusters the device doesn't own
     simply aren't in its tables — the HBM analogue of "only open shards
     that own probed centroids", /root/reference/src/ivf_index.rs:222-246);
  3. sweeps candidates with one of the single-chip bodies: the masked
     dense matmul, or the block-stream Pallas kernel over a device-local
     CHUNK-aligned stream table (probed blocks only — the path that wins
     beyond the ~150k-row dense/stream crossover, so an 8-device 1M+ corpus
     search runs the same selective kernel it would single-chip);

then a single ``all_gather`` over ICI collects the (n_dev, nq, k) partial
results and a fused final top-k merges them — replacing the reference's
``futures::join_all`` over file reads (ivf_index.rs:249).

Construction performs ZERO corpus-sized device->host fetches: per-device
tables are sliced from the index's host mirror (``idx._host_data``; over
this environment's device tunnel a 1M-row d2h fetch costs minutes).

n_probe stays traced under a static quantized probe bound, so nearby nprobe
sweep points share one compiled program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import sq_norms
from ..ops.topk import topk_smallest
from ..storage.layout import ALIGN, SENTINEL_NORM, SENTINEL_THRESHOLD
from ..utils.tracing import trace


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fine_metric(index) -> str:
    """Fine-ranking metric: cosine reduces to ip (inputs normalized —
    payloads at build, queries by ``_normalize_cosine``)."""
    return index.metric if index.metric != "cosine" else "ip"


def choose_local_body(
    index, host_tables, n_probe: int, nq_local: int = 1024
) -> str:
    """Local-slice application of the ONE calibrated dense/stream byte
    model (ivf.choose_sweep_body), shared by every mesh searcher's
    'auto'. ``nq_local`` is the per-device query count (replicated
    batches pass the full batch; query-parallel meshes their slice)."""
    from ..index.ivf import choose_sweep_body
    from ..ops.pallas.block_stream import pick_chunk

    d = index.dimension
    itemsize = jnp.dtype(index.stream_dtype).itemsize
    rows_local = host_tables.local_vecs.shape[1]
    lengths = np.asarray(host_tables.local_lengths).reshape(-1)
    chunk = pick_chunk(lengths, d, itemsize)
    return choose_sweep_body(
        lengths, rows_local, d, itemsize, nq_local, n_probe, chunk
    )


def _normalize_cosine(index, queries: np.ndarray) -> np.ndarray:
    if index.metric != "cosine":
        return queries
    nrm = np.linalg.norm(queries, axis=1, keepdims=True)
    return (queries / np.maximum(nrm, 1e-12)).astype(np.float32)


@dataclasses.dataclass
class LocalTables:
    """Host-side (numpy) per-device tables, ready for device_put under any
    mesh/sharding. Built from the index's host mirror — no corpus d2h."""

    local_vecs: np.ndarray  # (n_dev, rows, d) f32, ALIGN-aligned runs
    local_norms: np.ndarray  # (n_dev, rows) f32; SENTINEL on pads
    local_cent: np.ndarray  # (n_dev, kc_local, d) f32; zeros on pads
    local_csq: np.ndarray  # (n_dev, kc_local) f32; +inf on pads
    local_run_starts_b: np.ndarray  # (n_dev, kc_local) i32 local run blocks
    local_lengths: np.ndarray  # (n_dev, kc_local) i32; 0 on pads
    local_perm: np.ndarray  # (n_dev, rows) i64 -> internal id; -1 pads
    shard_to_dev: np.ndarray  # (num_shards,) i64
    cents: np.ndarray  # (kc, d) f32 global centroid table
    c_sq: np.ndarray  # (kc,) f32


def build_local_tables(index, n_dev: int) -> LocalTables:
    """Partition the posting layout into per-device tables (host-side).

    Whole shards are balanced over devices by row count (greedy LPT);
    payload rows are sliced from ``index._host_data`` (internal-id order,
    maintained by fit and load) so construction never fetches the
    corpus-sized HBM table back to host."""
    with trace("sharded.build_local_tables", n_dev=n_dev):
        return _build_local_tables(index, n_dev)


def _build_local_tables(index, n_dev: int) -> LocalTables:
    lay = index.layout
    if lay is None:
        raise RuntimeError("index has no posting layout")

    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    kc = len(lengths)
    c2s = np.asarray(index.centroids_to_shard)
    perm = lay.perm

    host = getattr(index, "_host_data", None)
    fetched = None
    if host is None:
        # Fallback (no mirror): one full-table fetch. Avoided everywhere a
        # mirror exists — see module docstring.
        fetched = np.asarray(lay.vectors)

    # Balance whole shards over devices by row count (greedy LPT).
    shard_rows = np.zeros(index.num_shards, np.int64)
    for c in range(kc):
        shard_rows[c2s[c]] += lengths[c]
    order = np.argsort(-shard_rows, kind="stable")
    dev_rows = np.zeros(n_dev, np.int64)
    shard_to_dev = np.zeros(index.num_shards, np.int64)
    for s in order:
        d_ = int(np.argmin(dev_rows))
        shard_to_dev[s] = d_
        dev_rows[d_] += shard_rows[s]

    dim = index.dimension
    cluster_order = np.argsort(c2s, kind="stable")
    dev_clusters = [[] for _ in range(n_dev)]
    for c in cluster_order:
        dev_clusters[int(shard_to_dev[c2s[c]])].append(int(c))

    rows_per_dev = max(
        (
            sum(_round_up(int(lengths[c]), ALIGN) for c in cl)
            for cl in dev_clusters
        ),
        default=0,
    )
    rows_per_dev = _round_up(max(rows_per_dev, ALIGN) + ALIGN, ALIGN)
    kc_local = max((len(cl) for cl in dev_clusters), default=1)
    kc_local = max(kc_local, 1)

    local_vecs = np.zeros((n_dev, rows_per_dev, dim), np.float32)
    local_norms = np.full((n_dev, rows_per_dev), SENTINEL_NORM, np.float32)
    # Local centroid tables in local run order; padding rows keep +inf
    # coarse distance so they are never probed.
    local_cent = np.zeros((n_dev, kc_local, dim), np.float32)
    local_csq = np.full((n_dev, kc_local), np.inf, np.float32)
    # Pad slots point past the block grid; their scatter contributions are
    # dropped in-kernel (mode='drop').
    local_run_starts_b = np.full(
        (n_dev, kc_local), rows_per_dev // ALIGN, np.int32
    )
    local_lengths = np.zeros((n_dev, kc_local), np.int32)
    local_perm = np.full((n_dev, rows_per_dev), -1, np.int64)

    cents = np.ascontiguousarray(index.centroids, np.float32)
    for d_, cl in enumerate(dev_clusters):
        fill = 0
        for i, c in enumerate(cl):
            m = int(lengths[c])
            s = int(starts[c])
            local_run_starts_b[d_, i] = fill // ALIGN
            local_lengths[d_, i] = m
            local_cent[d_, i] = cents[c]
            local_csq[d_, i] = (cents[c].astype(np.float64) ** 2).sum()
            internal = perm[s : s + m]
            block = (
                host[internal] if fetched is None else fetched[s : s + m]
            )
            local_vecs[d_, fill : fill + m] = block
            local_norms[d_, fill : fill + m] = (
                (block.astype(np.float64) ** 2).sum(1).astype(np.float32)
            )
            local_perm[d_, fill : fill + m] = internal
            fill += _round_up(m, ALIGN)

    return LocalTables(
        local_vecs=local_vecs,
        local_norms=local_norms,
        local_cent=local_cent,
        local_csq=local_csq,
        local_run_starts_b=local_run_starts_b,
        local_lengths=local_lengths,
        local_perm=local_perm,
        shard_to_dev=shard_to_dev,
        cents=cents,
        c_sq=(cents.astype(np.float64) ** 2).sum(1).astype(np.float32),
    )


def build_local_stream_tables(tables: LocalTables, dtype) -> dict:
    with trace(
        "sharded.build_stream_tables",
        n_dev=tables.local_vecs.shape[0],
        dtype=str(dtype),
    ):
        return _build_local_stream_tables(tables, dtype)


def _build_local_stream_tables(tables: LocalTables, dtype) -> dict:
    """Per-device CHUNK-aligned RESIDUAL stream tables (host-side numpy),
    the multi-chip twin of ops.pallas.block_stream.build_stream_table.

    Returns stacked arrays (leading n_dev axis) plus the static m_pad and
    the per-table chunk (block rows — identical on every device so shapes
    stay static under shard_map). Cluster slot kc_local is the zero-length
    'pad probe' target: local probe slots whose coarse distance exceeds the
    global threshold are redirected there and contribute no tasks."""
    from ..ops.pallas.block_stream import pick_chunk

    n_dev, rows, d = tables.local_vecs.shape
    kc_local = tables.local_cent.shape[1]
    CHUNK = pick_chunk(
        tables.local_lengths.reshape(-1), d, jnp.dtype(dtype).itemsize
    )

    sizes = _round_up_arr(np.maximum(tables.local_lengths, 0), CHUNK)
    m_pad = int(max(sizes.sum(axis=1).max(), CHUNK))
    m_pad = _round_up(m_pad, CHUNK)

    svecs = np.zeros((n_dev, m_pad, d), np.float32)
    snorms = np.full((n_dev, m_pad), SENTINEL_NORM, np.float32)
    sto_local = np.full((n_dev, m_pad), rows - 1, np.int32)  # pad -> last row
    sblk0 = np.zeros((n_dev, kc_local + 1), np.int32)
    slen = np.zeros((n_dev, kc_local + 1), np.int32)
    blk_cid = np.zeros((n_dev, m_pad // CHUNK), np.int32)
    scales = np.ones((n_dev, kc_local + 1), np.float32)
    int8 = jnp.dtype(dtype) == jnp.int8

    for d_ in range(n_dev):
        base = 0
        for i in range(kc_local):
            m = int(tables.local_lengths[d_, i])
            if m == 0:
                sblk0[d_, i] = 0
                continue
            src = int(tables.local_run_starts_b[d_, i]) * ALIGN
            res = (
                tables.local_vecs[d_, src : src + m]
                - tables.local_cent[d_, i]
            )
            if int8:
                # Symmetric per-cluster quantization (same scheme as
                # build_stream_table); norms stored for the dequantized rows.
                s = max(float(np.abs(res).max()) / 127.0, 1e-12)
                scales[d_, i] = s
                q8 = np.clip(np.round(res / s), -127, 127)
                res = q8 * s
                svecs[d_, base : base + m] = q8
            else:
                svecs[d_, base : base + m] = res
                # Norms of the rows AS STORED (single-chip builder parity):
                # with the two-pass bf16 cross the kernel distance is then
                # exact to the quantized point c + r-hat.
                res = res.astype(jnp.dtype(dtype)).astype(np.float32)
            snorms[d_, base : base + m] = (
                (res.astype(np.float64) ** 2).sum(1).astype(np.float32)
            )
            sto_local[d_, base : base + m] = np.arange(src, src + m)
            size = _round_up(m, CHUNK)
            sblk0[d_, i] = base // CHUNK
            slen[d_, i] = m
            blk_cid[d_, base // CHUNK : (base + size) // CHUNK] = i
            base += size

    return dict(
        svecs=svecs.astype(jnp.dtype(dtype)),  # ml_dtypes handles bf16
        snorms=snorms,
        sto_local=sto_local,
        sblk0=sblk0,
        slen=slen,
        blk_cid=blk_cid,
        scales=scales,
        m_pad=m_pad,
        chunk=CHUNK,
    )


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def _stream_slots(local_lengths: np.ndarray, n_probe: int, chunk: int) -> int:
    """Per-device task-slot budget for the sharded stream kernel.

    A device sees only the globally-probed cells it owns, so its expected
    task count uses GLOBAL probe probabilities (n_probe * len / n_total)
    over its local cells; the budget covers the busiest device at ~1.25x
    its expectation (cap: its n_probe longest local lists, chunk-rounded —
    never more slots than could be filled). Quantized like the single-chip
    sizing so nearby sweep points share compiles."""
    from ..ops.gather import quantize_up
    from ..ops.pallas.block_stream import FAN

    ln = np.asarray(local_lengths, np.float64)  # (n_dev, kc_local)
    n_total = max(ln.sum(), 1.0)
    p = np.minimum(1.0, n_probe * ln / n_total)
    exp_d = (p * np.ceil(ln / chunk)).sum(axis=1).max()
    worst = 1
    for d_ in range(ln.shape[0]):
        top = np.sort(ln[d_])[::-1][:n_probe]
        worst = max(worst, int(np.ceil(top / chunk).sum()))
    t = max(min(worst, int(1.25 * exp_d) + 2), 1)
    return _round_up(quantize_up(t), FAN)


class ShardedSearcher:
    """Device-sharded posting layout + compiled sharded search program.

    ``method``: 'dense' (masked full matmul of the local slice), 'stream'
    (local block-stream Pallas sweep + exact f32 re-rank), or 'auto' (pick
    per call with the single-chip byte-cost model applied to the LOCAL
    slice size — an 8-device slice of a small corpus stays dense, a big
    corpus slice streams)."""

    def __init__(self, index, mesh: Mesh, axis: str = "shards",
                 method: str = "auto"):
        if method not in ("auto", "dense", "dense_fused", "stream"):
            raise ValueError(f"unknown sharded search method: {method}")
        self.mesh = mesh
        self.axis = axis
        self.index = index
        self.method = method
        n_dev = mesh.shape[axis]
        self.n_dev = n_dev

        t = build_local_tables(index, n_dev)
        self._host_tables = t
        self.shard_to_dev = t.shard_to_dev
        self.local_perm = t.local_perm

        shard_spec = NamedSharding(mesh, P(axis))
        self.local_vecs = jax.device_put(t.local_vecs, shard_spec)
        self.local_norms = jax.device_put(t.local_norms, shard_spec)
        self.local_cent = jax.device_put(t.local_cent, shard_spec)
        self.local_csq = jax.device_put(t.local_csq, shard_spec)
        self.local_run_starts_b = jax.device_put(
            t.local_run_starts_b, shard_spec
        )

        repl = NamedSharding(mesh, P())
        self.centroids = jax.device_put(t.cents, repl)
        self.c_sq = jax.device_put(t.c_sq, repl)
        self._stream = None  # built lazily on first stream call

    # -- stream-table staging ------------------------------------------

    def _stream_tables(self):
        if self._stream is None:
            st = build_local_stream_tables(
                self._host_tables, self.index.stream_dtype
            )
            sh = NamedSharding(self.mesh, P(self.axis))
            self._stream = {
                k: (jax.device_put(v, sh) if isinstance(v, np.ndarray) else v)
                for k, v in st.items()
            }
        return self._stream

    def _choose(self, nq: int, n_probe: int) -> str:
        """'auto' -> the shared local dense/stream byte model
        (``choose_local_body``; shared-kernel variant not offered here)."""
        if self.method != "auto":
            return self.method
        return choose_local_body(
            self.index, self._host_tables, n_probe, nq_local=nq
        )

    # -- search ---------------------------------------------------------

    def search_batch(
        self, queries: np.ndarray, k: int, n_probe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(nq, d) -> (D, I_internal) with +inf/-1 padding. On spilled
        indexes the device program runs at (1+spill)*k width and duplicate
        ids are dropped host-side before the final k cut."""
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
        queries = _normalize_cosine(self.index, queries)
        kc = self.centroids.shape[0]
        n_probe = min(n_probe, kc)
        spill = getattr(self.index, "spill", 0)
        kk = (1 + spill) * k

        D, rows, devs = self._search_device(queries, kk, n_probe)
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

    def _search_device(self, queries: np.ndarray, k: int, n_probe: int):
        from ..ops.gather import quantize_up

        kc = self.centroids.shape[0]
        probe_bound = min(quantize_up(max(n_probe, 1)), kc)
        method = self._choose(len(queries), n_probe)

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
            nq = len(queries)
            q_tile = min(q_tile, _round_up(nq, 8))
            nq_pad = _round_up(nq, q_tile)
            qp = np.zeros((nq_pad, queries.shape[1]), np.float32)
            qp[:nq] = queries
            return _sharded_stream_program(
                self.mesh,
                self.axis,
                jax.device_put(
                    jnp.asarray(qp), NamedSharding(self.mesh, P())
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
                k=k,
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

        fused_plan = None
        q_align = 8
        if method == "dense_fused":
            # Fused Pallas local sweep: same gate as the single-chip path
            # (falls back to the XLA body when the plan rejects the point).
            from ..ops.pallas.flat_sweep import plan_fused

            d = self.index.dimension
            rows_local = self._host_tables.local_vecs.shape[1]
            if d % 128 == 0:
                fused_plan = plan_fused(rows_local, d, len(queries), k)
            if fused_plan is not None:
                q_align = fused_plan[1]  # queries must tile the kernel grid

        nq = len(queries)
        nq_pad = _round_up(nq, q_align)
        qp = np.zeros((nq_pad, queries.shape[1]), np.float32)
        qp[:nq] = queries
        return _sharded_search_program(
            self.mesh,
            self.axis,
            jax.device_put(jnp.asarray(qp), NamedSharding(self.mesh, P())),
            self.centroids,
            self.c_sq,
            self.local_vecs,
            self.local_norms,
            self.local_cent,
            self.local_csq,
            self.local_run_starts_b,
            jnp.int32(n_probe),
            k=k,
            probe_bound=probe_bound,
            fused_plan=fused_plan,
            interpret=jax.default_backend() == "cpu",
            metric=_fine_metric(self.index),
        )


def _dedup_host(internal: np.ndarray, D: np.ndarray):
    """Drop duplicate ids per row (keep first = smallest distance),
    compacting survivors left; rows stay distance-sorted. Delegates to the
    vectorized index.ivf._host_dedup_topk — a per-row python loop here
    measured ~0.5 s/kilobatch, which would cap spilled multi-chip
    throughput at ~2k qps regardless of device speed."""
    from ..index.ivf import _host_dedup_topk

    D2, I2 = _host_dedup_topk(D, internal, D.shape[1])
    return I2, D2


def _coarse_threshold(q, q_sq, centroids, c_sq, n_probe, probe_bound):
    """Global n_probe-th smallest coarse distance per query. Bounded top_k
    (static probe_bound >= traced n_probe) replaces a full (nq, kc) sort:
    cost scales with the probe bound, not nlist, and the quantized bound
    lets nearby sweep points share one compile."""
    cross_g = jnp.dot(
        q, centroids.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dcoarse_g = q_sq[:, None] - 2.0 * cross_g + c_sq[None, :]
    neg_top, _ = jax.lax.top_k(-dcoarse_g, probe_bound)  # ascending dists
    sorted_g = -neg_top
    return jax.lax.dynamic_slice_in_dim(
        sorted_g, jnp.clip(n_probe - 1, 0, probe_bound - 1), 1, axis=1
    )


def _make_per_device(
    centroids, c_sq, n_probe, k, axis, n_dev, probe_bound, merge_fn=None,
    fused_plan=None, interpret=False, metric="l2",
):
    """Per-device masked-dense search body shared by the 1-D, 2-D and
    multi-host mesh programs. ``merge_fn(dloc, rloc, nq)`` overrides the
    final collective (default: flat ``_ici_merge`` over ``axis``) — the
    multi-host program passes a hierarchical ICI-then-DCN merge.
    ``fused_plan`` = (w, q_tile, c_groups) routes the local masked sweep
    through the fused Pallas kernel (ops/pallas/flat_sweep.py) instead of
    the XLA matmul + wide topk — the local slice has the same
    selection-over-materialized-plane cost the single-chip path avoids.
    ``metric``: coarse probing is ALWAYS L2 (posting lists are built by L2
    assignment — same invariant as the single-chip paths); only the fine
    ranking uses 'l2' or 'ip' (cosine = ip over normalized inputs)."""

    def per_device(q, vecs, norms, cent_l, csq_l, rsb):
        vecs, norms = vecs[0], norms[0]
        cent_l, csq_l, rsb = cent_l[0], csq_l[0], rsb[0]
        nq = q.shape[0]
        rows_local = vecs.shape[0]
        nb = rows_local // ALIGN

        q_sq = sq_norms(q)
        thresh = _coarse_threshold(
            q, q_sq, centroids, c_sq, n_probe, probe_bound
        )

        # Local probe mask in local run order (pads have +inf coarse dist).
        cross_l = jnp.dot(
            q, cent_l.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dcoarse_l = q_sq[:, None] - 2.0 * cross_l + csq_l[None, :]
        s_ord = (dcoarse_l <= thresh).astype(jnp.float32)  # (nq, kc_local)

        delta = s_ord - jnp.concatenate(
            [jnp.zeros((nq, 1), jnp.float32), s_ord[:, :-1]], axis=1
        )
        wall = jnp.zeros((nq, nb), jnp.float32).at[
            jnp.arange(nq)[:, None], jnp.broadcast_to(rsb[None, :], delta.shape)
        ].add(delta, mode="drop")
        mask_b = jnp.cumsum(wall, axis=1) > 0.5

        if fused_plan is not None:
            from ..ops.pallas.flat_sweep import S as _S, flat_sweep_topk_plane

            w, q_tile, c_groups = fused_plan
            NB = _S * w
            nj = -(-rows_local // NB)
            mcols = nj * NB // ALIGN
            mb = mask_b.astype(jnp.float32)
            if mcols > nb:
                mb = jnp.pad(mb, ((0, 0), (0, mcols - nb)))
            # '3pass' matches the single-chip fused default (the sweep is
            # MXU-compute-bound; see _flat_search_fused_program).
            vals, rows = flat_sweep_topk_plane(
                q, vecs, norms, mb,
                metric=metric, w=w, c_groups=c_groups, q_tile=q_tile,
                precision="3pass", interpret=interpret,
            )
            dloc, pos = topk_smallest(vals, k)
            rloc = jnp.take_along_axis(rows, jnp.maximum(pos, 0), axis=1)
            if metric == "l2":
                dloc = jnp.maximum(dloc + q_sq[:, None], 0.0)
            real = jnp.isfinite(dloc) & (dloc < SENTINEL_THRESHOLD) & (
                pos >= 0
            )
        else:
            mask = jnp.repeat(mask_b, ALIGN, axis=1)
            cross = jnp.dot(
                q, vecs.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            if metric == "l2":
                dist = jnp.maximum(
                    q_sq[:, None] - 2.0 * cross + norms[None, :], 0.0
                )
            else:  # ip: smaller = better; sentinel rows keep their +1e30
                dist = jnp.where(
                    norms >= SENTINEL_THRESHOLD, norms, 0.0
                )[None, :] - cross
            dist = jnp.where(mask, dist, jnp.inf)
            dloc, rloc = topk_smallest(dist, k)
            real = jnp.isfinite(dloc) & (dloc < SENTINEL_THRESHOLD)
        dloc = jnp.where(real, dloc, jnp.inf)
        rloc = jnp.where(real, rloc, -1)
        if merge_fn is not None:
            return merge_fn(dloc, rloc, nq)
        return _ici_merge(dloc, rloc, axis, n_dev, nq, k)

    return per_device


def _ici_merge(dloc, rloc, axis, n_dev, nq, k):
    """ICI merge: gather every device's partial top-k, fuse final top-k."""
    my_dev = jax.lax.axis_index(axis)
    all_d = jax.lax.all_gather(dloc, axis)  # (n_dev, nq, k)
    all_r = jax.lax.all_gather(rloc, axis)
    all_dev = jax.lax.all_gather(jnp.full((nq, k), my_dev, jnp.int32), axis)
    cat_d = jnp.moveaxis(all_d, 0, 1).reshape(nq, n_dev * k)
    cat_r = jnp.moveaxis(all_r, 0, 1).reshape(nq, n_dev * k)
    cat_dev = jnp.moveaxis(all_dev, 0, 1).reshape(nq, n_dev * k)
    dfin, sel = topk_smallest(cat_d, k)
    sel_safe = jnp.maximum(sel, 0)
    rfin = jnp.where(sel >= 0, jnp.take_along_axis(cat_r, sel_safe, axis=1), -1)
    dvfin = jnp.where(sel >= 0, jnp.take_along_axis(cat_dev, sel_safe, axis=1), -1)
    rfin = jnp.where(jnp.isfinite(dfin), rfin, -1)
    dvfin = jnp.where(jnp.isfinite(dfin), dvfin, -1)
    return dfin, rfin, dvfin


def _merge_carry_payload(dloc, rloc, pdev, axis, n_dev, nq, k):
    """Like ``_ici_merge`` but the device-owner payload already exists
    (second stage of a hierarchical merge: each participant carries the
    flat owner ids its earlier merge resolved)."""
    all_d = jax.lax.all_gather(dloc, axis)  # (n_dev, nq, k)
    all_r = jax.lax.all_gather(rloc, axis)
    all_p = jax.lax.all_gather(pdev, axis)
    cat_d = jnp.moveaxis(all_d, 0, 1).reshape(nq, n_dev * k)
    cat_r = jnp.moveaxis(all_r, 0, 1).reshape(nq, n_dev * k)
    cat_p = jnp.moveaxis(all_p, 0, 1).reshape(nq, n_dev * k)
    dfin, sel = topk_smallest(cat_d, k)
    sel_safe = jnp.maximum(sel, 0)
    rfin = jnp.where(sel >= 0, jnp.take_along_axis(cat_r, sel_safe, axis=1), -1)
    pfin = jnp.where(sel >= 0, jnp.take_along_axis(cat_p, sel_safe, axis=1), -1)
    rfin = jnp.where(jnp.isfinite(dfin), rfin, -1)
    pfin = jnp.where(jnp.isfinite(dfin), pfin, -1)
    return dfin, rfin, pfin


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "probe_bound", "fused_plan",
                     "interpret", "metric"),
)
def _sharded_search_program(
    mesh,
    axis,
    queries,  # (nq, d) replicated
    centroids,  # (kc, d) replicated — GLOBAL coarse table
    c_sq,  # (kc,) replicated
    local_vecs,  # (n_dev, rows, d) sharded on axis, block-aligned runs
    local_norms,  # (n_dev, rows) sharded; SENTINEL_NORM on pads
    local_cent,  # (n_dev, kc_local, d) sharded — local run-order centroids
    local_csq,  # (n_dev, kc_local) sharded; +inf on pads
    local_run_starts_b,  # (n_dev, kc_local) sharded — local run blocks
    n_probe,  # () int32 traced (within the static probe_bound)
    *,
    k: int,
    probe_bound: int,
    fused_plan=None,  # (w, q_tile, c_groups) -> fused Pallas local sweep
    interpret: bool = False,
    metric: str = "l2",
):
    from jax import shard_map

    per_device = _make_per_device(
        centroids, c_sq, n_probe, k, axis, mesh.shape[axis], probe_bound,
        fused_plan=fused_plan, interpret=interpret, metric=metric,
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        local_run_starts_b,
    )


def _make_per_device_stream(
    centroids, c_sq, n_probe, k, axis, n_dev, probe_bound, t_fixed, q_tile,
    chunk, metric, rerank, interpret, merge_fn=None,
):
    """Per-device block-stream search body: probed-blocks-only Pallas sweep
    of the device-local stream table + exact f32 re-rank from the local
    main table, then the ICI top-k merge (or ``merge_fn`` — the multi-host
    hierarchical merge — when given)."""
    from ..ops.pallas.block_stream import StreamTable, block_stream_search

    def per_device(
        q, vecs, norms, cent_l, csq_l,
        svecs, snorms, sto_local, sblk0, slen, blk_cid, scales,
    ):
        vecs, norms = vecs[0], norms[0]
        cent_l, csq_l = cent_l[0], csq_l[0]
        svecs, snorms, sto_local = svecs[0], snorms[0], sto_local[0]
        sblk0, slen, blk_cid, scales = sblk0[0], slen[0], blk_cid[0], scales[0]
        nq_all, d = q.shape
        kc_local = cent_l.shape[0]

        # Pad the local centroid table so 'pad probe' slot kc_local exists
        # for redirected (unprobed) slots: zero-length, contributes nothing.
        table = StreamTable(
            vecs=svecs,
            norms=snorms,
            to_main=sto_local,
            sblk0=sblk0,
            lengths=slen,
            cent=jnp.pad(cent_l, ((0, 1), (0, 0))),
            blk_cid=blk_cid,
            scales=scales,
            m_pad=svecs.shape[0],
            dtype=svecs.dtype,
            chunk=chunk,
        )
        pb_l = min(probe_bound, kc_local)

        def one_tile(qt):
            q_sq = sq_norms(qt)
            thresh = _coarse_threshold(
                qt, q_sq, centroids, c_sq, n_probe, probe_bound
            )
            cross_l = jnp.dot(
                qt, cent_l.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            dcoarse_l = q_sq[:, None] - 2.0 * cross_l + csq_l[None, :]
            pvals, ploc = jax.lax.top_k(-dcoarse_l, pb_l)
            # Slots past the global threshold -> the zero-length pad probe.
            probe = jnp.where(-pvals <= thresh, ploc, kc_local).astype(
                jnp.int32
            )
            # Same shortlist-widening rule as the single-chip stream path
            # (index/ivf.py): int8 quantization noise needs a 4x/128-floor
            # re-rank margin where bf16 needs 2x/64.
            wide = 4 if table.dtype == jnp.int8 else 2
            kk = min(max(wide * k, 64 * (wide // 2)), t_fixed * chunk)
            dvals, rows = block_stream_search(
                qt, table, probe, kk,
                t_fixed=t_fixed, metric=metric, approx=True,
                interpret=interpret,
            )
            if rerank:
                # Exact f32 re-rank from the local main table.
                from ..index.ivf import _exact_rerank

                dvals, rows = _exact_rerank(
                    qt, q_sq, rows, vecs, norms, k, metric
                )
            else:
                # Single-chip no-re-rank parity (index/ivf.py): clamp the
                # f32-rounding ~-1e-5 on self matches, and exact-narrow
                # the widened approximate selection kk -> k by the kernel
                # distances.
                if metric == "l2":
                    dvals = jnp.where(
                        jnp.isfinite(dvals), jnp.maximum(dvals, 0.0), dvals
                    )
                dvals, order = topk_smallest(dvals, k)
                rows = jnp.take_along_axis(
                    rows, jnp.maximum(order, 0), axis=1
                )
                rows = jnp.where(
                    (order >= 0) & jnp.isfinite(dvals), rows, -1
                )
            real = (rows >= 0) & jnp.isfinite(dvals) & (
                dvals < SENTINEL_THRESHOLD
            )
            return (
                jnp.where(real, dvals, jnp.inf),
                jnp.where(real, rows, -1),
            )

        tiles = q.reshape(nq_all // q_tile, q_tile, d)
        dloc, rloc = jax.lax.map(one_tile, tiles)
        dloc = dloc.reshape(nq_all, k)
        rloc = rloc.reshape(nq_all, k)
        if merge_fn is not None:
            return merge_fn(dloc, rloc, nq_all)
        return _ici_merge(dloc, rloc, axis, n_dev, nq_all, k)

    return per_device


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "k", "probe_bound", "t_fixed", "q_tile", "chunk",
        "metric", "rerank", "interpret",
    ),
)
def _sharded_stream_program(
    mesh,
    axis,
    queries,  # (nq_pad, d) replicated; nq_pad % q_tile == 0
    centroids,
    c_sq,
    local_vecs,
    local_norms,
    local_cent,
    local_csq,
    svecs,  # (n_dev, m_pad, d) stream-table residual rows, sharded
    snorms,  # (n_dev, m_pad)
    sto_local,  # (n_dev, m_pad) i32 -> local main row
    sblk0,  # (n_dev, kc_local+1) i32
    slen,  # (n_dev, kc_local+1) i32
    blk_cid,  # (n_dev, m_pad/CHUNK) i32
    scales,  # (n_dev, kc_local+1) f32 int8 dequant scales (1.0 otherwise)
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

    per_device = _make_per_device_stream(
        centroids, c_sq, n_probe, k, axis, mesh.shape[axis], probe_bound,
        t_fixed, q_tile, chunk, metric, rerank, interpret,
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 11,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        svecs, snorms, sto_local, sblk0, slen, blk_cid, scales,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "q_axis", "shard_axis", "k", "probe_bound",
                     "metric", "fused_plan", "interpret"),
)
def _sharded_search_program_2d(
    mesh,
    q_axis,
    shard_axis,
    queries,  # (nq, d) SHARDED over q_axis
    centroids,
    c_sq,
    local_vecs,  # sharded over shard_axis, replicated over q_axis
    local_norms,
    local_cent,
    local_csq,
    local_run_starts_b,
    n_probe,
    *,
    k: int,
    probe_bound: int,
    metric: str = "l2",
    fused_plan=None,
    interpret: bool = False,
):
    """Query-parallel x shard-parallel search: each (q, s) device handles its
    query slice against its shard slice; the top-k merge all_gather runs over
    the shard axis only."""
    from jax import shard_map

    per_device = _make_per_device(
        centroids, c_sq, n_probe, k, shard_axis, mesh.shape[shard_axis],
        probe_bound, metric=metric, fused_plan=fused_plan,
        interpret=interpret,
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(q_axis),
            P(shard_axis),
            P(shard_axis),
            P(shard_axis),
            P(shard_axis),
            P(shard_axis),
        ),
        out_specs=(P(q_axis), P(q_axis), P(q_axis)),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        local_run_starts_b,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "q_axis", "shard_axis", "k", "probe_bound", "t_fixed",
        "q_tile", "chunk", "metric", "rerank", "interpret",
    ),
)
def _sharded_stream_program_2d(
    mesh,
    q_axis,
    shard_axis,
    queries,  # (nq_pad, d) SHARDED over q_axis; per-device slice % q_tile == 0
    centroids,
    c_sq,
    local_vecs,
    local_norms,
    local_cent,
    local_csq,
    svecs,  # stream-table arrays, sharded over shard_axis
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
    """Query-parallel x shard-parallel block-stream search: the same
    per-device probed-blocks body as the 1-D stream program, on each
    device's (query slice, shard slice) pair; the merge all_gather rides
    the shard axis only."""
    from jax import shard_map

    per_device = _make_per_device_stream(
        centroids, c_sq, n_probe, k, shard_axis, mesh.shape[shard_axis],
        probe_bound, t_fixed, q_tile, chunk, metric, rerank, interpret,
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(q_axis),) + (P(shard_axis),) * 11,
        out_specs=(P(q_axis), P(q_axis), P(q_axis)),
        check_vma=False,
    )
    return fn(
        queries, local_vecs, local_norms, local_cent, local_csq,
        svecs, snorms, sto_local, sblk0, slen, blk_cid, scales,
    )
