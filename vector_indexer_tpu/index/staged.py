"""Host-resident staged serving: unbounded-corpus mode.

This is the direct TPU analogue of the reference's core bigger-than-RAM
design point (/root/reference/src/shards.rs:188-349: posting lists live on
disk and search issues selective per-query cluster-block reads), with host
RAM taking the disk role and HBM taking RAM's:

  * the posting layout (vector table, norms, CSR offsets) stays in HOST
    memory — device HBM holds only the centroid table (kc x d, tiny);
  * per query batch, the device coarse scan picks the probed cells, the
    HOST packs just those cells' aligned posting blocks into a compact
    staging buffer, and ONE h2d transfer ships it;
  * the existing masked-dense program then sweeps the staged sub-table
    exactly as it would the full table (the staged buffer is itself a
    valid cluster-run layout), so results are bit-identical to the
    device-resident 'dense' path restricted to the probed cells — which
    is the same result set as 'gather'/'dense' by construction.

Capacity is therefore bounded by host RAM, not HBM: only
union(probed cells) x d x 4 bytes are device-resident at any time. The
cost model is the reference's too — staged bytes grow with batch-wide
probe union, so this mode pays off at small batches / low n_probe /
large nlist, and the harness's work accounting reports the staged MB per
query so the trade is visible (bench_all_ivf.py:326-361 parity).

Static-shape discipline: the staging buffer's row count and the union's
cluster count quantize up to the {2^m, 1.5*2^m} grid and n_probe stays
traced, so consecutive batches and whole nprobe sweeps reuse one compiled
program (compiles cost 3-300 s in this environment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import sq_norms
from ..ops.gather import quantize_up
from ..storage.layout import ALIGN, SENTINEL_NORM
from ..utils.tracing import trace


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.jit
def _coarse_probe_mask(queries, centroids, c_sq, n_probe):
    """(nq, kc) bool: cell probed <=> coarse L2 <= the n_probe-th smallest
    (same tie-inclusive rule as the masked-dense program, so the staged
    result set matches 'dense' exactly). n_probe is traced: one compile
    serves a whole sweep."""
    from .ivf import _score

    q_sq = sq_norms(queries)
    dcoarse = _score(queries, centroids, c_sq, q_sq, "l2")
    sorted_c = jnp.sort(dcoarse, axis=1)
    thresh = jax.lax.dynamic_slice_in_dim(
        sorted_c, jnp.maximum(n_probe - 1, 0), 1, axis=1
    )
    return dcoarse <= thresh


def _pack_stage(lay, union, d):
    """Pack the union cells' aligned posting runs into one compact buffer.

    Returns (staged_vecs, staged_norms, cent_order_rows, run_starts_b,
    staged_to_orig). The buffer is a valid run layout: every cell's rows
    start at an ALIGN multiple, gap rows keep their sentinel norms (they
    are copied straight from the source layout, which maintains the same
    invariant), and at least one trailing sentinel block terminates the
    last run for the mask's closing delta.
    """
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    alens = _round_up_arr(lengths[union].astype(np.int64), ALIGN)
    sub_starts = np.zeros(len(union), np.int64)
    if len(union) > 1:
        np.cumsum(alens[:-1], out=sub_starts[1:])
    r_used = int(alens.sum())
    r_pad = max(_round_up(quantize_up(r_used + ALIGN), ALIGN), 2 * ALIGN)

    # One fancy-index gather over the host table (rows of each aligned run,
    # gaps included — their sentinel norms ride along for free).
    rows_idx = np.concatenate(
        [np.arange(s, s + m) for s, m in zip(starts[union], alens)]
    ) if len(union) else np.zeros(0, np.int64)

    staged_vecs = np.zeros((r_pad, d), np.float32)
    staged_norms = np.full(r_pad, SENTINEL_NORM, np.float32)
    if r_used:
        staged_vecs[:r_used] = lay.vectors[rows_idx]
        staged_norms[:r_used] = lay.row_norms[rows_idx]

    staged_to_orig = np.full(r_pad, -1, np.int64)
    staged_to_orig[:r_used] = rows_idx
    return staged_vecs, staged_norms, sub_starts, staged_to_orig, r_used


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def staged_search(idx, queries, k: int, n_probe: int):
    """Search a host-resident index: coarse on device, probed-cell staging
    h2d, masked-dense sweep on the staged sub-table. Returns (D, I) with
    the standard +inf/-1 padding contract; on spilled indexes the program
    runs (1+spill)x wide and duplicates are dropped host-side."""
    from .ivf import (
        _host_dedup_topk,
        _ivf_search_dense_program,
        pick_q_tile,
    )

    lay = idx.layout
    queries = np.ascontiguousarray(queries, np.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    nq, d = queries.shape
    if d != idx.dimension:
        raise ValueError(
            f"query dimension mismatch: expected {idx.dimension}, got {d}"
        )
    q = queries
    if idx.metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    metric = idx.metric if idx.metric != "cosine" else "ip"
    n_probe = min(n_probe, idx.num_clusters)
    spill = getattr(idx, "spill", 0)
    kk = (1 + spill) * k

    centroids, c_sq = idx._device_tables()
    with trace("staged.coarse", nq=nq, n_probe=n_probe):
        mask = np.asarray(
            _coarse_probe_mask(jnp.asarray(q), centroids, c_sq,
                               jnp.int32(n_probe))
        )
    union = np.flatnonzero(mask.any(axis=0))
    # Layout order keeps the pack a sequence of forward slices (and makes
    # the staged buffer deterministic for a given probe set).
    starts_all = np.asarray(lay.offsets)[:-1]
    union = union[np.argsort(starts_all[union], kind="stable")]

    with trace("staged.pack", cells=len(union)):
        staged_vecs, staged_norms, sub_starts, staged_to_orig, r_used = (
            _pack_stage(lay, union, d)
        )
    r_pad = staged_vecs.shape[0]
    u_pad = max(quantize_up(max(len(union), 1)), 8)

    # Union-cell centroid table in staged-run order; pad cells carry a
    # sentinel squared-norm so their coarse distance can never pass the
    # threshold, and their run start points at the sentinel tail block so
    # a probed run preceding them is closed at the right boundary.
    cent_ord = np.zeros((u_pad, d), np.float32)
    cent_ord[: len(union)] = idx.centroids[union]
    csq_ord = np.full(u_pad, SENTINEL_NORM, np.float32)
    csq_ord[: len(union)] = (
        cent_ord[: len(union)].astype(np.float64) ** 2
    ).sum(1).astype(np.float32)
    run_starts_b = np.full(u_pad, r_used // ALIGN, np.int32)
    run_starts_b[: len(union)] = (sub_starts // ALIGN).astype(np.int32)

    q_tile = pick_q_tile(nq, max(r_pad * 4 // d, 1), d)
    nq_pad = _round_up(nq, q_tile)
    qp = np.zeros((nq_pad, d), np.float32)
    qp[:nq] = q

    # Work accounting hook (harness reads it after a search).
    idx._last_stage_bytes = r_pad * d * 4 + r_pad * 4

    with trace("staged.sweep", rows=r_pad, cells=len(union)):
        dv, rows = _ivf_search_dense_program(
            jnp.asarray(qp),
            jnp.asarray(cent_ord),
            jnp.asarray(csq_ord),
            jnp.asarray(staged_vecs),
            jnp.asarray(staged_norms),
            jnp.asarray(run_starts_b),
            jnp.int32(n_probe),
            k=min(kk, r_pad),
            q_tile=q_tile,
            approx=lay.n > 50_000,
            metric=metric,
        )
        dv = np.asarray(dv)[:nq]
        rows = np.asarray(rows)[:nq]

    orig_rows = np.where(
        rows >= 0, staged_to_orig[np.clip(rows, 0, r_pad - 1)], -1
    )
    bound = max(lay.rows_used - 1, 0)
    internal = np.where(
        orig_rows >= 0, lay.perm[np.clip(orig_rows, 0, bound)], -1
    )
    dv = np.where(internal >= 0, dv, np.inf).astype(np.float32)
    if spill:
        return _host_dedup_topk(dv, internal, k)
    if dv.shape[1] > k:  # kk was clamped to r_pad but may still exceed k
        dv, internal = dv[:, :k], internal[:, :k]
    if dv.shape[1] < k:  # tiny staged buffer clamped kk below k: pad out
        padc = k - dv.shape[1]
        dv = np.pad(dv, ((0, 0), (0, padc)), constant_values=np.inf)
        internal = np.pad(internal, ((0, 0), (0, padc)), constant_values=-1)
    return dv, internal.astype(np.int64)
