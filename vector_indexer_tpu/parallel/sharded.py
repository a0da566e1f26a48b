"""Multi-chip sharded IVF search: shard_map over a 'shards' mesh axis.

Design (survey §5.8): posting lists are partitioned across devices by shard
(clusters of one shard are contiguous rows of the layout, so a device slice
is a contiguous row range). Queries and the full centroid table are
replicated — the coarse quantizer is tiny. Each device:

  1. computes the GLOBAL probe threshold (the n_probe-th smallest coarse
     distance over all centroids — replicated work, no communication);
  2. masks its LOCAL cluster-sorted table with the same block-aligned
     prefix-sum expansion as the single-chip dense path (clusters the device
     doesn't own simply aren't in its table — the HBM analogue of "only open
     shards that own probed centroids", /root/reference/src/ivf_index.rs:222-246);
  3. full local distance matmul + top-k;

then a single ``all_gather`` over ICI collects the (n_dev, nq, k) partial
results and a fused final top-k merges them — replacing the reference's
``futures::join_all`` over file reads (ivf_index.rs:249).

n_probe is traced, so one compiled program serves a whole nprobe sweep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import sq_norms
from ..ops.topk import topk_smallest
from ..storage.layout import ALIGN, SENTINEL_NORM, SENTINEL_THRESHOLD


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
            d_ = int(np.argmin(dev_rows))
            shard_to_dev[s] = d_
            dev_rows[d_] += shard_rows[s]
        self.shard_to_dev = shard_to_dev

        dim = index.dimension
        vecs = np.asarray(lay.vectors)
        norms = np.asarray(lay.row_norms)
        perm = lay.perm

        # Per-device cluster membership, in global layout (cluster_order).
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
        # Local centroid tables in local run order; padding rows keep
        # +inf coarse distance so they are never probed.
        local_cent = np.zeros((n_dev, kc_local, dim), np.float32)
        local_csq = np.full((n_dev, kc_local), np.inf, np.float32)
        # Pad slots point past the block grid; their scatter contributions
        # are dropped in-kernel (mode='drop').
        local_run_starts_b = np.full(
            (n_dev, kc_local), rows_per_dev // ALIGN, np.int32
        )
        # Global result ids: map (device, local_row) -> internal id.
        self.local_perm = np.full((n_dev, rows_per_dev), -1, np.int64)

        cents = np.asarray(index.centroids, np.float32)
        for d_, cl in enumerate(dev_clusters):
            fill = 0
            for i, c in enumerate(cl):
                m = int(lengths[c])
                s = int(starts[c])
                local_run_starts_b[d_, i] = fill // ALIGN
                local_cent[d_, i] = cents[c]
                local_csq[d_, i] = (cents[c].astype(np.float64) ** 2).sum()
                local_vecs[d_, fill : fill + m] = vecs[s : s + m]
                local_norms[d_, fill : fill + m] = norms[s : s + m]
                self.local_perm[d_, fill : fill + m] = perm[s : s + m]
                fill += _round_up(m, ALIGN)
            # Unused centroid slots point at block 0 with no probe (inf csq).

        shard_spec = NamedSharding(mesh, P(axis))
        self.local_vecs = jax.device_put(local_vecs, shard_spec)
        self.local_norms = jax.device_put(local_norms, shard_spec)
        self.local_cent = jax.device_put(local_cent, shard_spec)
        self.local_csq = jax.device_put(local_csq, shard_spec)
        self.local_run_starts_b = jax.device_put(local_run_starts_b, shard_spec)

        repl = NamedSharding(mesh, P())
        self.centroids = jax.device_put(cents, repl)
        self.c_sq = jax.device_put(
            (cents.astype(np.float64) ** 2).sum(1).astype(np.float32), repl
        )
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

        D, rows, devs = _sharded_search_program(
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
        )
        D = np.asarray(D)[:nq]
        rows = np.asarray(rows)[:nq]
        devs = np.asarray(devs)[:nq]
        internal = np.where(
            rows >= 0,
            self.local_perm[np.clip(devs, 0, None), np.clip(rows, 0, None)],
            -1,
        )
        return D, internal


def _make_per_device(centroids, c_sq, n_probe, k, axis, n_dev):
    """Per-device search body shared by the 1-D and 2-D mesh programs."""

    def per_device(q, vecs, norms, cent_l, csq_l, rsb):
        vecs, norms = vecs[0], norms[0]
        cent_l, csq_l, rsb = cent_l[0], csq_l[0], rsb[0]
        my_dev = jax.lax.axis_index(axis)
        nq = q.shape[0]
        rows_local = vecs.shape[0]
        nb = rows_local // ALIGN
        kc_local = cent_l.shape[0]

        q_sq = sq_norms(q)
        # Global probe threshold (replicated compute, no comms).
        cross_g = jnp.dot(
            q, centroids.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dcoarse_g = q_sq[:, None] - 2.0 * cross_g + c_sq[None, :]
        sorted_g = jnp.sort(dcoarse_g, axis=1)
        thresh = jax.lax.dynamic_slice_in_dim(
            sorted_g, jnp.maximum(n_probe - 1, 0), 1, axis=1
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
        mask = jnp.repeat(mask_b, ALIGN, axis=1)

        dist = (
            q_sq[:, None]
            - 2.0
            * jnp.dot(
                q, vecs.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + norms[None, :]
        )
        dist = jnp.where(mask, jnp.maximum(dist, 0.0), jnp.inf)
        dloc, rloc = topk_smallest(dist, k)
        real = jnp.isfinite(dloc) & (dloc < SENTINEL_THRESHOLD)
        dloc = jnp.where(real, dloc, jnp.inf)
        rloc = jnp.where(real, rloc, -1)

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

    return per_device


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "k"))
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
    n_probe,  # () int32 traced
    *,
    k: int,
):
    from jax import shard_map

    per_device = _make_per_device(
        centroids, c_sq, n_probe, k, axis, mesh.shape[axis]
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


@functools.partial(jax.jit, static_argnames=("mesh", "q_axis", "shard_axis", "k"))
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
):
    """Query-parallel x shard-parallel search: each (q, s) device handles its
    query slice against its shard slice; the top-k merge all_gather runs over
    the shard axis only."""
    from jax import shard_map

    per_device = _make_per_device(
        centroids, c_sq, n_probe, k, shard_axis, mesh.shape[shard_axis]
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
