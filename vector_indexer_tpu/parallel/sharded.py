"""Multi-chip sharded IVF search: shard_map over a 'shards' mesh axis.

Design (survey §5.8): posting lists are partitioned across devices by shard
(clusters of one shard are contiguous rows of the layout, so a device slice
is a contiguous row range). Queries and the centroid table are replicated —
the coarse quantizer is tiny. Each device:

  1. coarse top-n_probe over ALL centroids (replicated matmul);
  2. windowed gather limited to clusters IT owns (others have local length 0
     — the HBM analogue of "only open shards that own probed centroids",
     /root/reference/src/ivf_index.rs:222-246);
  3. exact re-rank + local top-k;

then a single ``all_gather`` over ICI collects the (n_dev, nq, k) partial
results and a fused final top-k merges them — replacing the reference's
``futures::join_all`` over file reads (ivf_index.rs:249).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import sq_norms
from ..ops.gather import candidate_budget, packed_candidate_rows
from ..ops.topk import topk_smallest


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedSearcher:
    """Device-sharded posting layout + compiled sharded search program."""

    def __init__(self, index, mesh: Mesh, axis: str = "shards"):
        self.mesh = mesh
        self.axis = axis
        self.index = index
        n_dev = mesh.shape[axis]
        lay = index.layout
        if lay is None:
            raise RuntimeError("index has no posting layout")

        starts = np.asarray(lay.offsets)[:-1]
        lengths = np.asarray(lay.lengths)
        kc = len(lengths)
        c2s = np.asarray(index.centroids_to_shard)

        # Balance whole shards over devices by row count (greedy LPT).
        shard_rows = np.zeros(index.num_shards, np.int64)
        for c in range(kc):
            shard_rows[c2s[c]] += lengths[c]
        order = np.argsort(-shard_rows, kind="stable")
        dev_rows = np.zeros(n_dev, np.int64)
        shard_to_dev = np.zeros(index.num_shards, np.int64)
        for s in order:
            d = int(np.argmin(dev_rows))
            shard_to_dev[s] = d
            dev_rows[d] += shard_rows[s]
        self.shard_to_dev = shard_to_dev

        rows_per_dev = int(dev_rows.max()) if n_dev > 0 else 0
        rows_per_dev = _round_up(max(rows_per_dev, 1) + 1, 8)  # +1 pad row

        dim = index.dimension
        vecs = np.asarray(lay.vectors)[: lay.rows_used]
        norms = np.asarray(lay.row_norms)[: lay.rows_used]
        perm = lay.perm

        local_vecs = np.zeros((n_dev, rows_per_dev, dim), np.float32)
        local_norms = np.zeros((n_dev, rows_per_dev), np.float32)
        local_starts = np.zeros((n_dev, kc), np.int32)
        local_lengths = np.zeros((n_dev, kc), np.int32)
        # Global result ids: map (device, local_row) -> internal id.
        self.local_perm = np.full((n_dev, rows_per_dev), -1, np.int64)

        fill = np.zeros(n_dev, np.int64)
        cluster_order = np.argsort(c2s, kind="stable")
        for c in cluster_order:
            d = int(shard_to_dev[c2s[c]])
            m = int(lengths[c])
            s = int(starts[c])
            local_starts[d, c] = fill[d]
            local_lengths[d, c] = m
            local_vecs[d, fill[d] : fill[d] + m] = vecs[s : s + m]
            local_norms[d, fill[d] : fill[d] + m] = norms[s : s + m]
            self.local_perm[d, fill[d] : fill[d] + m] = perm[s : s + m]
            fill[d] += m

        shard_spec = NamedSharding(mesh, P(axis))
        self.local_vecs = jax.device_put(local_vecs, shard_spec)
        self.local_norms = jax.device_put(local_norms, shard_spec)
        self.local_starts = jax.device_put(local_starts, shard_spec)
        self.local_lengths = jax.device_put(local_lengths, shard_spec)

        repl = NamedSharding(mesh, P())
        c = np.asarray(index.centroids, np.float32)
        self.centroids = jax.device_put(c, repl)
        self.c_sq = jax.device_put((c.astype(np.float64) ** 2).sum(1).astype(np.float32), repl)
        self.max_list_len = int(lengths.max()) if kc else 1
        self.all_lengths = lengths
        self.n_dev = n_dev

    def search_batch(
        self, queries: np.ndarray, k: int, n_probe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(nq, d) -> (D, I_internal) with +inf/-1 padding."""
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
        kc = self.centroids.shape[0]
        n_probe = min(n_probe, kc)
        nq_pad = _round_up(nq, 8)
        qp = np.zeros((nq_pad, d), np.float32)
        qp[:nq] = queries

        cache = getattr(self, "_budget_cache", None)
        if cache is None:
            cache = self._budget_cache = {}
        if n_probe not in cache:
            # Per-device budget: a device owns a subset of probed clusters,
            # so the global exact budget is a safe upper bound.
            cache[n_probe] = candidate_budget(self.all_lengths, n_probe)
        budget = cache[n_probe]

        D, rows, devs = _sharded_search_program(
            self.mesh,
            self.axis,
            jax.device_put(jnp.asarray(qp), NamedSharding(self.mesh, P())),
            self.centroids,
            self.c_sq,
            self.local_vecs,
            self.local_norms,
            self.local_starts,
            self.local_lengths,
            k=k,
            n_probe=n_probe,
            budget=budget,
        )
        D = np.asarray(D)[:nq]
        rows = np.asarray(rows)[:nq]
        devs = np.asarray(devs)[:nq]
        internal = np.where(
            rows >= 0, self.local_perm[np.clip(devs, 0, None), np.clip(rows, 0, None)], -1
        )
        return D, internal


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "n_probe", "budget"),
)
def _sharded_search_program(
    mesh,
    axis,
    queries,  # (nq, d) replicated
    centroids,  # (kc, d) replicated
    c_sq,  # (kc,) replicated
    local_vecs,  # (n_dev, rows, d) sharded on axis
    local_norms,  # (n_dev, rows) sharded
    local_starts,  # (n_dev, kc) sharded
    local_lengths,  # (n_dev, kc) sharded
    *,
    k: int,
    n_probe: int,
    budget: int,
):
    n_dev = mesh.shape[axis]

    def per_device(q, vecs, norms, starts, lengths):
        # Block-local views: leading dim 1 from the shard axis.
        vecs, norms = vecs[0], norms[0]
        starts, lengths = starts[0], lengths[0]
        my_dev = jax.lax.axis_index(axis)
        pad_row = vecs.shape[0] - 1

        q_sq = sq_norms(q)
        cross = jnp.dot(
            q, centroids.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dcoarse = q_sq[:, None] - 2.0 * cross + c_sq[None, :]
        _, probe = jax.lax.top_k(-dcoarse, n_probe)  # (nq, p) same on all devs

        nq = q.shape[0]
        # ln is 0 for clusters this device doesn't own, so the packed-CSR
        # enumeration naturally skips them (the HBM analogue of "only open
        # shards that own probed centroids").
        rows_f, valid_f = packed_candidate_rows(
            starts[probe], lengths[probe], budget, pad_row
        )

        cand = vecs[rows_f]
        cross2 = jnp.einsum(
            "qd,qcd->qc", q, cand, precision=jax.lax.Precision.HIGHEST
        )
        dist = q_sq[:, None] - 2.0 * cross2 + norms[rows_f]
        dist = jnp.where(valid_f, jnp.maximum(dist, 0.0), jnp.inf)
        dloc, ci = topk_smallest(dist, k)
        rloc = jnp.where(
            (ci >= 0) & jnp.isfinite(dloc),
            jnp.take_along_axis(rows_f, jnp.maximum(ci, 0), axis=1),
            -1,
        )

        # ICI merge: gather every device's partial top-k, fuse final top-k.
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

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return fn(queries, local_vecs, local_norms, local_starts, local_lengths)
