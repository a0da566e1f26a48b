"""Two-level IVF-Flat index: build (fit) and batched search.

Build parity (/root/reference/src/ivf_index.rs:58-177):
  * nlist / max-iteration heuristics from corpus size;
  * mini-batch k-means over the corpus;
  * super-centroid k-means over the centroid table with
    num_shards = ceil(sqrt(nlist)) and derived seed ``seed*31 + 7``;
  * empty posting lists filtered and centroid ids densely remapped;
  * centroid -> shard table retained as index metadata.

Search redesign (reference: ivf_index.rs:190-267 streams shard files per
query): batched static-shape device programs —
  coarse L2 matmul -> top-n_probe cells -> candidate selection (packed-CSR
  gather, block-masked dense sweep, exhaustive flat, or Pallas range-DMA)
  -> exact metric ranking -> fused top-k
— which is the single biggest structural win over the reference's sequential
per-query loop (bindings/python/src/lib.rs:74-97). n_probe is traced in the
dense paths, so one compile serves a whole nprobe sweep.
"""

from __future__ import annotations

import functools
import logging
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.kmeans import run_kmeans_lloyd, run_kmeans_mini_batch
from ..ops.distance import sq_norms
from ..ops.gather import candidate_budget, packed_candidate_rows
from ..ops.topk import topk_smallest
from ..storage.layout import PostingLayout, build_layout
from ..storage.vector_store import VectorStore
from ..utils.heuristics import (
    calculate_max_iterations,
    calculate_num_clusters,
    num_shards_for,
)
from ..utils.tracing import trace

log = logging.getLogger("vector_indexer_tpu")

# The method-decision model (auto resolution, fused-routing gates, byte
# model, tile/slot sizing) lives in index/dispatch.py — ONE module consumed
# by both this dispatcher and the bench harness's work accounting. The
# names below are re-exported here for backward compatibility (tests,
# mesh searchers, and A/B scripts import them from this module).
# Offloaded (larger-than-HBM) serving lives in index/offload.py; the
# IvfIndex methods below are thin delegates. The shortlist epilogues are
# re-exported here for their historical import path (staged.py,
# parallel/sharded.py, tests).
from . import offload as _offload
from .offload import (  # noqa: F401  (re-exports)
    _dedup_topk,
    _host_dedup_topk,
    _host_topk,
)
from .dispatch import (  # noqa: F401  (re-exports)
    _FUSED_SWEEP_ON,
    _QUERY_TILE,
    SHARED_MIN_NQ,
    SHARED_MIN_PROBED_ROWS,
    STREAM_FIXED_QBYTES,
    choose_sweep_body,
    mean_slot_rows_of,
    pick_q_tile,
    resolve,
    shared_gate,
    stream_params,
)


# Exact-re-rank placement in the stream program: hoisted OUT of the
# per-q_tile sweep loop to ~4096-query super-tiles. The round-5
# decomposition (bench_results/stream_overhead) measured the per-tile
# re-rank at 8.5-10.1 us/q — 65% of the stream path's total — vs ~4 us/q
# for the same shapes at full batch (the kk-row random gather and batched
# GEMV amortize with depth). VITPU_HOISTED_RERANK=0 restores the per-tile
# placement for A/B.
_HOISTED_RERANK = os.environ.get("VITPU_HOISTED_RERANK", "1") == "1"


def _stream_rerank_wanted(table_dtype) -> bool:
    """Whether the device stream program should append the exact f32
    shortlist re-rank for a quantized table. Read at TRACE time (not
    import) so A/B scripts and tests can toggle per call.

    VITPU_STREAM_RERANK=1 forces the re-rank on; =0 forces it off; unset
    picks the measured default: OFF for bf16 tables when the two-pass
    cross term is live (the kernel distance is then the EXACT f32
    distance to the quantized point c + r-hat — see _bf16_cross /
    build_stream_table — and the re-rank's 8.6 us/q was 65% of the whole
    path, bench_results/stream_overhead), ON for int8 tables (+-s_c/2
    row error is coarse enough that the exact re-rank still decides
    near-boundary order; int8's value is capacity, not throughput)."""
    env = os.environ.get("VITPU_STREAM_RERANK")
    if env is not None:
        return env == "1"
    import jax.numpy as jnp
    from ..ops.pallas.block_stream import _BF16_2PASS

    if jnp.dtype(table_dtype) == jnp.bfloat16 and _BF16_2PASS:
        return False
    return True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _score(qt, table, table_norms, q_sq, metric, precision=None):
    """Batched 'distance' (smaller = better) for the supported metrics.

    l2: exact squared L2 via the norm expansion. ip: negated inner product
    (cosine reduces to ip after normalization at build/search). Sentinel
    (gap/tail) rows carry SENTINEL_NORM in table_norms: for l2 that term
    dominates directly; for ip it is added as an explicit penalty.

    ``precision`` defaults to HIGHEST (exact f32 MXU passes); DEFAULT runs
    the cross term single-pass (bf16 inputs, f32 accumulation — ~0.2%
    relative error; norms stay exact f32) at ~3x throughput.
    """
    cross = jnp.dot(
        qt, table.T,
        precision=jax.lax.Precision.HIGHEST if precision is None else precision,
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        return jnp.maximum(q_sq[:, None] - 2.0 * cross + table_norms[None, :], 0.0)
    # ip / cosine: smaller = better = more-negative similarity.
    penalty = jnp.where(table_norms >= 1e29, table_norms, 0.0)
    return -cross + penalty[None, :]


def _exact_rerank(qt, q_sq, rows, vectors, row_norms, k, metric):
    """Exact f32 re-rank of a selected shortlist: recompute the winners'
    distances from the f32 table and re-select the top k. This removes the
    fast sweeps' bf16 cross-term error (~0.2% of |q||x| — whole units on
    raw far-from-origin vectors) from both the returned distances and the
    near-boundary ordering. rows < 0 slots pass through as +inf/-1;
    sentinel rows keep their >=1e29 penalty and can never win."""
    rows0 = jnp.maximum(rows, 0)
    cand = vectors[rows0]  # (q, kk, d)
    cross = jnp.einsum(
        "qd,qkd->qk", qt, cand, precision=jax.lax.Precision.HIGHEST
    )
    norms_sel = row_norms[rows0]
    if metric == "l2":
        exact = jnp.maximum(q_sq[:, None] - 2.0 * cross + norms_sel, 0.0)
    else:
        exact = -cross + jnp.where(norms_sel >= 1e29, norms_sel, 0.0)
    exact = jnp.where(rows >= 0, exact, jnp.inf)
    dv, order = topk_smallest(exact, k)
    rsel = jnp.take_along_axis(rows, jnp.maximum(order, 0), axis=1)
    rsel = jnp.where((order >= 0) & jnp.isfinite(dv), rsel, -1)
    return dv, rsel


@functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "budget", "q_tile", "metric")
)
def _ivf_search_program(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0
    centroids,  # (kc, d) f32
    c_sq,  # (kc,) f32
    vectors,  # (n_pad, d) f32 cluster-permuted, zero pad rows at tail
    row_norms,  # (n_pad,) f32
    starts,  # (kc,) int32 cluster start rows
    lengths,  # (kc,) int32 posting lengths
    *,
    k: int,
    n_probe: int,
    budget: int,
    q_tile: int,
    metric: str = "l2",
):
    nq_pad, d = queries.shape
    pad_row = vectors.shape[0] - 1  # always a zero row (layout pads n+1..)

    def one_tile(qt):
        q_sq = sq_norms(qt)
        # Coarse quantizer scan: one (q_tile, kc) matmul on the MXU — the
        # reference does this scalar per query (ivf_index.rs:204-213).
        # ALWAYS L2: posting lists were built by L2 assignment, so cells must
        # be probed by the same rule regardless of the ranking metric.
        dcoarse = _score(qt, centroids, c_sq, q_sq, "l2")
        _, probe = jax.lax.top_k(-dcoarse, n_probe)  # (q_tile, n_probe)

        # Packed-CSR candidate rows: budget scales with the SUM of probed
        # list lengths, immune to single-cluster skew.
        rows_f, valid_f = packed_candidate_rows(
            starts[probe], lengths[probe], budget, pad_row
        )

        cand = vectors[rows_f]  # (q_tile, C, d) HBM gather
        cross2 = jnp.einsum(
            "qd,qcd->qc", qt, cand, precision=jax.lax.Precision.HIGHEST
        )
        if metric == "l2":
            dist = jnp.maximum(
                q_sq[:, None] - 2.0 * cross2 + row_norms[rows_f], 0.0
            )
        else:
            norms_sel = row_norms[rows_f]
            dist = -cross2 + jnp.where(norms_sel >= 1e29, norms_sel, 0.0)
        dist = jnp.where(valid_f, dist, jnp.inf)

        dvals, ci = topk_smallest(dist, k)
        rows_sel = jnp.take_along_axis(rows_f, jnp.maximum(ci, 0), axis=1)
        ivals = jnp.where((ci >= 0) & jnp.isfinite(dvals), rows_sel, -1)
        return dvals, ivals

    tiles = queries.reshape(nq_pad // q_tile, q_tile, d)
    dvals, ivals = jax.lax.map(one_tile, tiles)
    return dvals.reshape(nq_pad, k), ivals.reshape(nq_pad, k)


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "approx", "metric"))
def _ivf_search_dense_program(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0
    centroids_ord,  # (kc, d) — centroid table REORDERED to layout-run order
    c_sq_ord,  # (kc,)
    vectors,  # (n_pad, d) cluster-permuted, runs ALIGN-aligned
    row_norms,  # (n_pad,) — SENTINEL_NORM on gap/tail rows
    run_starts_b,  # (kc,) int32 — run begin BLOCKS, ascending layout order
    n_probe,  # () int32 — TRACED so one compile serves a whole nprobe sweep
    *,
    k: int,
    q_tile: int,
    approx: bool = False,
    metric: str = "l2",
):
    """Masked dense path: full distance matmul over the cluster-sorted table,
    with unprobed clusters masked out — same result set as the gather path,
    but the MXU runs one large matmul instead of an HBM row gather. Wins for
    large query batches (the table sweep is shared by the whole tile).

    Gather-free masking: the centroid table is pre-reordered to match the
    row layout, so "cluster is probed" is just ``coarse distance <= the
    n_probe-th smallest`` per query; per-run membership deltas scattered at
    run-start BLOCKS + prefix-summed over the n/ALIGN block grid expand it
    exactly (runs are block-aligned; gap rows carry sentinel norms). The
    block grid makes the prefix sum ALIGN x cheaper than a row-level mask;
    a take_along_axis formulation measured ~10x slower still.
    """
    from ..storage.layout import ALIGN, SENTINEL_THRESHOLD

    nq_pad, d = queries.shape
    n_pad = vectors.shape[0]
    nb = n_pad // ALIGN

    def one_tile(qt):
        q_sq = sq_norms(qt)
        # ALWAYS L2 (assignment-consistent cell probing; see gather path).
        dcoarse = _score(qt, centroids_ord, c_sq_ord, q_sq, "l2")
        # n_probe-th smallest coarse distance as the probe threshold; full
        # sort (kc is small) keeps n_probe traced -> no recompile per sweep
        # point.
        sorted_coarse = jnp.sort(dcoarse, axis=1)
        thresh = jax.lax.dynamic_slice_in_dim(
            sorted_coarse, jnp.maximum(n_probe - 1, 0), 1, axis=1
        )
        s_ord = (dcoarse <= thresh).astype(jnp.float32)  # (q_tile, kc)

        delta = s_ord - jnp.concatenate(
            [jnp.zeros((q_tile, 1), jnp.float32), s_ord[:, :-1]], axis=1
        )
        wall = jnp.zeros((q_tile, nb), jnp.float32)
        wall = wall.at[:, run_starts_b].add(delta)
        mask_b = jnp.cumsum(wall, axis=1) > 0.5
        mask = jnp.repeat(mask_b, ALIGN, axis=1)  # exact: runs are aligned

        dist = _score(qt, vectors, row_norms, q_sq, metric)
        dist = jnp.where(mask, dist, jnp.inf)
        if approx:
            # Hardware PartialReduce selection: ~12x faster than exact top_k
            # at (256, 100k) -> 100 (measured 31ms -> 2.6ms per 1024-query
            # batch). The sweep matmul stays HIGHEST precision: it is
            # HBM-bound, so exact f32 passes cost only ~10% over single-pass
            # bf16 (measured 189k vs 211k qps at n=100k d=128) and returned
            # distances are exact — while a bf16 sweep + exact re-rank of a
            # widened shortlist measured 4x SLOWER (54k qps: the survivor
            # row gather dominates). Selection recall >= recall_target shows
            # up honestly in measured R@k.
            dvals, rows = jax.lax.approx_min_k(dist, k, recall_target=0.99)
        else:
            dvals, rows = topk_smallest(dist, k)
        # Sentinel (gap/tail) rows never count as results.
        real = jnp.isfinite(dvals) & (dvals < SENTINEL_THRESHOLD)
        rows = jnp.where(real, rows, -1)
        dvals = jnp.where(real, dvals, jnp.inf)
        return dvals, rows

    tiles = queries.reshape(nq_pad // q_tile, q_tile, d)
    dvals, rows = jax.lax.map(one_tile, tiles)
    return dvals.reshape(nq_pad, k), rows.reshape(nq_pad, k)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n_probe", "t_fixed", "q_tile", "approx", "rerank",
        "metric", "shared", "t_cap", "interpret",
    ),
)
def _ivf_search_stream_program(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0
    centroids,  # (kc, d) f32
    c_sq,  # (kc,) f32
    stream_table,  # ops.pallas.block_stream.StreamTable (pytree)
    main_vectors,  # (n_pad, d) f32 — exact re-rank source
    main_row_norms,  # (n_pad,) f32
    *,
    k: int,
    n_probe: int,
    t_fixed: int,
    q_tile: int,
    approx: bool,
    rerank: bool,
    metric: str = "l2",
    shared: bool = False,
    t_cap: int = 0,
    interpret: bool = False,
):
    """Probed-blocks-only search: coarse top-n_probe -> static per-query
    task slots -> block-stream Pallas sweep -> top-k (-> optional exact f32
    re-rank of a widened shortlist, see ``rerank``). Touches only
    ~n_probe/nlist of the table — the path where IVF probing actually pays
    on TPU (the dense path sweeps everything and masks).

    ``rerank=False`` (the bf16 default since round 5 — _stream_rerank_wanted)
    returns the kernel's distances directly: with the two-pass cross term
    and stored-row norms they are the EXACT f32 distance to the table's
    quantized point c + r-hat, so the error vs the true vector is
    2(q-x).(x - x-hat) + |x - x-hat|^2 — bounded by the candidate's own
    distance times ~0.2% of its residual, the same approximate-D family as
    the fused flat sweep's 3pass default. The exact re-rank stage it
    replaces measured 8.6-9.8 us/q — 65% of the whole path
    (bench_results/stream_overhead); stream_exact remains the full-f32
    escape hatch and VITPU_STREAM_RERANK=1 restores the re-rank.

    Queries are tiled so each kernel call's scalar-prefetched task arrays
    (2 x q_tile*t_fixed int32) fit SMEM. ``shared=True`` uses the block-major
    kernel (each probed block fetched once per tile and scored against up to
    Q_SHARE queries; ``t_cap`` is its static task budget).
    """
    from ..ops.pallas.block_stream import (
        block_stream_search,
        block_stream_search_shared,
    )

    nq_pad, d = queries.shape

    # Low-precision selection keeps a widened shortlist for the exact
    # re-rank, absorbing bf16 ordering noise near the k-th boundary.
    # The floor of 64 covers small k: residual-bf16 distance error is
    # proportional to CLUSTER SPREAD (|q-c|*0.4%*|r|), so corpora whose
    # k-means leaves high-spread (whale) clusters can distort individual
    # distances by whole units — a 2k shortlist at k=5 then drops real
    # neighbors. int8 tables quantize at ~s_c/2 per component and widen
    # further. stream_exact remains the exactness escape hatch.
    wide = 4 if stream_table.dtype == jnp.int8 else 2
    kk = min(max(wide * k, 64 * (wide // 2)), t_fixed * stream_table.chunk)
    # The widened shortlist stays even WITHOUT the re-rank: the in-sweep
    # selection is hardware-approximate (approx_min_k recall_target=0.99
    # per element, and the fused kernel's top-2-per-lane planes), so
    # selecting only k would shave ~1% of true neighbors on real TPU;
    # selecting kk then exact-narrowing by the same kernel distances is a
    # ~free (nq, kk) top-k and recovers the selection (not distance) part
    # of what the re-rank used to fix.

    def one_tile(qt):
        q_sq = sq_norms(qt)
        # ALWAYS L2 cell probing (assignment-consistent; see gather path).
        dcoarse = _score(qt, centroids, c_sq, q_sq, "l2")
        if approx and centroids.shape[0] > 1024:
            # Hardware PartialReduce for cell selection: exact lax.top_k over
            # a (q_tile, kc) coarse matrix measured ~5 ms/kilobatch at
            # kc=4000 — several times the whole probed sweep.
            _, probe = jax.lax.approx_min_k(dcoarse, n_probe, recall_target=0.99)
        else:
            _, probe = jax.lax.top_k(-dcoarse, n_probe)  # (q_tile, n_probe)

        if shared:
            dvals, rows = block_stream_search_shared(
                qt, stream_table, probe, kk,
                t_fixed=t_fixed, t_cap=t_cap, metric=metric, approx=approx,
                interpret=interpret,
            )
        else:
            dvals, rows = block_stream_search(
                qt, stream_table, probe, kk,
                t_fixed=t_fixed, metric=metric, approx=approx,
                interpret=interpret,
            )
        return dvals, rows

    tiles = queries.reshape(nq_pad // q_tile, q_tile, d)
    dvals, rows = jax.lax.map(one_tile, tiles)
    dvals = dvals.reshape(nq_pad, kk)
    rows = rows.reshape(nq_pad, kk)
    if not rerank:
        if metric == "l2":
            # Kernel distances are |q - (c + r-hat)|^2 assembled from
            # exact f32 pieces; f32 rounding of the three-term sum can
            # leave ~-1e-5 on (near-)self matches — clamp like the exact
            # re-rank does.
            dvals = jnp.where(
                jnp.isfinite(dvals), jnp.maximum(dvals, 0.0), dvals
            )
        # Exact narrow kk -> k over the kernel distances (see the kk
        # comment above: keeps the approximate selection honest).
        dv, order = topk_smallest(dvals, k)
        rsel = jnp.take_along_axis(rows, jnp.maximum(order, 0), axis=1)
        rsel = jnp.where((order >= 0) & jnp.isfinite(dv), rsel, -1)
        return dv, rsel
    if not _HOISTED_RERANK:  # A/B baseline: per-sweep-tile re-rank
        def rr_small(args):
            qt, rws = args
            return _exact_rerank(
                qt, sq_norms(qt), rws, main_vectors, main_row_norms, k,
                metric,
            )

        dv, rw = jax.lax.map(
            rr_small,
            (tiles, rows.reshape(nq_pad // q_tile, q_tile, kk)),
        )
        return dv.reshape(nq_pad, k), rw.reshape(nq_pad, k)
    # Exact f32 re-rank of the shortlist (selection ran on the stream
    # table's dtype; distances recomputed from the main f32 table),
    # OUTSIDE the sweep's tile loop: the (kk)-row random gather + batched
    # GEMV amortize with batch depth, and running them per 256-query tile
    # measured 8.5 us/q vs ~3 at full batch — the dominant term of the
    # round-4 headline's 11 us/q non-sweep overhead
    # (bench_results/stream_overhead, round-4 task 2). Super-tiles bound
    # the gathered candidate block to ~4096 queries (~400 MB at kk=200)
    # so huge batches can't blow HBM.
    g = max(1, 4096 // q_tile)
    n_tiles = nq_pad // q_tile
    while n_tiles % g:
        g -= 1
    rt = g * q_tile
    if rt == nq_pad:
        return _exact_rerank(
            queries, sq_norms(queries), rows, main_vectors,
            main_row_norms, k, metric,
        )

    def rr_tile(args):
        qt, rws = args
        return _exact_rerank(
            qt, sq_norms(qt), rws, main_vectors, main_row_norms, k, metric
        )

    dvals, rows = jax.lax.map(
        rr_tile,
        (
            queries.reshape(nq_pad // rt, rt, d),
            rows.reshape(nq_pad // rt, rt, kk),
        ),
    )
    return dvals.reshape(nq_pad, k), rows.reshape(nq_pad, k)




@functools.partial(jax.jit, static_argnames=("k", "q_tile", "approx", "metric"))
def _flat_search_program(
    queries,  # (nq_pad, d)
    vectors,  # (n_pad, d)
    row_norms,  # (n_pad,) — SENTINEL_NORM on gap/tail rows
    *,
    k: int,
    q_tile: int,
    approx: bool,
    metric: str = "l2",
):
    """Flat (exhaustive) search: the no-quantizer operating point. On TPU a
    full-table MXU sweep + hardware approx selection outruns IVF probing up
    to multi-million-row corpora (the coarse scan + mask cost more than the
    FLOPs they save), so this is the recommended large-batch path when
    recall ~1.0 is wanted."""
    from ..storage.layout import SENTINEL_THRESHOLD

    nq_pad, d = queries.shape

    def one_tile(qt):
        q_sq = sq_norms(qt)
        # The fast variant pairs single-pass bf16-input matmul with the
        # hardware approximate selection; 'flat_exact' stays full f32.
        dist = _score(qt, vectors, row_norms, q_sq, metric)
        if approx:
            # HIGHEST-precision sweep + hardware approx selection (see the
            # dense path for the measured A/B): exact distances, ~10% cost.
            dvals, rows = jax.lax.approx_min_k(dist, k, recall_target=0.99)
        else:
            dvals, rows = topk_smallest(dist, k)
        # Sentinel (gap/tail) rows never count as results.
        real = jnp.isfinite(dvals) & (dvals < SENTINEL_THRESHOLD)
        rows = jnp.where(real, rows, -1)
        dvals = jnp.where(real, dvals, jnp.inf)
        return dvals, rows

    tiles = queries.reshape(nq_pad // q_tile, q_tile, d)
    dvals, rows = jax.lax.map(one_tile, tiles)
    return dvals.reshape(nq_pad, k), rows.reshape(nq_pad, k)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "q_tile", "w", "c_groups", "metric", "precision", "interpret"
    ),
)
def _flat_search_fused_program(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0, d % 128 == 0
    vectors,  # (n_pad, d) f32 — int8 under the int8 precisions
    row_norms,  # (n_pad,) f32 — SENTINEL_NORM on gap/tail rows
    vec_resid=None,  # (n_pad, d) int8 fixed-point residual (prec 'int8')
    scale_row=None,  # (n_pad,) f32 per-row int8 scales (int8 precisions)
    *,
    k: int,
    q_tile: int,
    w: int,
    c_groups: int,
    metric: str = "l2",
    precision: str = "3pass",
    interpret: bool = False,
):
    """Flat search through the fused sweep + on-chip top-2-plane Pallas
    kernel (ops/pallas/flat_sweep.py): the (nq, n) distance matrix never
    reaches HBM — only a fixed 2*C*S-column accumulator plane does — so
    neither the materialization traffic nor a wide-column ``top_k`` (TPU
    selection cost is ~flat in width above ~2k columns, ~11 ms/kilobatch)
    bounds the path. Distances stay exact f32 (HIGHEST in-kernel matmul;
    the lane-constant q_sq is added after selection, which it commutes
    with); the plane keeps the true nearest neighbor unconditionally and
    loses ~0.5% of the top-100 tail in expectation (see the kernel
    docstring's loss model).

    Sweep precision: '3pass' (bf16 hi/lo split) — 1.42x the 6-pass
    HIGHEST sweep (the kernel is MXU-COMPUTE-bound: HIGHEST runs at
    ~78% MXU peak, so pass count — not HBM bytes or plan shape — is the
    lever), measured same-window at n=1M with IDENTICAL selected plane
    rows. End-to-end (2026-08-18): flat 284.7k -> 344.3k qps at n=100k,
    91.3k -> 125.7k at n=1M, R@10 unchanged. Returned distances deviate
    from the XLA exact path by <= ~2e-3 absolute (~1e-5 relative at
    d=128 magnitudes; plane values are within ~3e-4 of an fp64 oracle)
    — the same order as the f32 accumulation noise already observed
    between this codebase's exact paths under different tilings. An
    exact re-rank of the shortlist was measured and REJECTED: the k-row
    random gather costs ~4-5 ms/kilobatch (the round-2 'survivor row
    gather dominates' trap) — more than the entire sweep saving
    (rerank variant measured 118.6k at n=100k vs 344.3k without).

    ``precision='int8'/'int8x1'``: fixed-point int8 sweep over a
    pre-quantized table (``quantize_table_int8``) — the explicit
    approximate operating points (methods 'flat_int8'/'flat_int8x1',
    faiss-SQ8-style). Norms stay exact f32; the cross-term error is
    ~1e-2 / ~0.3 absolute on unit-variance d=128 data (measured
    isotropic R@10 0.999 / 0.98 at n=100k)."""
    from ..ops.pallas.flat_sweep import flat_sweep_topk_plane
    from ..storage.layout import SENTINEL_THRESHOLD

    q_sq = sq_norms(queries)
    vals, rows = flat_sweep_topk_plane(
        queries, vectors, row_norms, None, vec_resid, scale_row,
        metric=metric, w=w, c_groups=c_groups, q_tile=q_tile,
        precision=precision, interpret=interpret,
    )
    dv, pos = topk_smallest(vals, k)
    rsel = jnp.take_along_axis(rows, jnp.maximum(pos, 0), axis=1)
    if metric == "l2":
        dv = jnp.maximum(dv + q_sq[:, None], 0.0)
    real = jnp.isfinite(dv) & (dv < SENTINEL_THRESHOLD) & (pos >= 0)
    rsel = jnp.where(real, rsel, -1)
    dv = jnp.where(real, dv, jnp.inf)
    return dv, rsel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "q_tile", "w", "c_groups", "metric", "precision", "interpret"
    ),
)
def _ivf_search_dense_fused_program(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0, d % 128 == 0
    centroids_ord,  # (kc, d) — centroid table REORDERED to layout-run order
    c_sq_ord,  # (kc,)
    vectors,  # (n_pad, d) cluster-permuted — int8 under the int8 precisions
    row_norms,  # (n_pad,) — SENTINEL_NORM on gap/tail rows
    run_starts_b,  # (kc,) int32 — run begin BLOCKS, ascending layout order
    n_probe,  # () int32 — TRACED so one compile serves a whole nprobe sweep
    vec_resid=None,  # (n_pad, d) int8 fixed-point residual (prec 'int8')
    scale_row=None,  # (n_pad,) f32 per-row int8 scales (int8 precisions)
    *,
    k: int,
    q_tile: int,
    w: int,
    c_groups: int,
    metric: str = "l2",
    precision: str = "3pass",
    interpret: bool = False,
):
    """Masked dense path through the fused Pallas kernel: the same
    gather-free block-mask construction as ``_ivf_search_dense_program``
    (coarse threshold -> run-start deltas -> block prefix sum), but the
    masked table sweep and the first selection stage run fused on-chip —
    the (nq, n) distance matrix never reaches HBM and the epilogue
    ``top_k`` runs on the fixed 2*C*S-column plane. The mask is applied
    in-kernel BEFORE the windowed min (an unprobed row can never shadow a
    probed one), expanded from block to row granularity by a 0/1 MXU
    matmul (see the kernel module docstring). n_probe stays traced, so a
    whole nprobe sweep shares one compile."""
    from ..ops.pallas.flat_sweep import S as _S, flat_sweep_topk_plane
    from ..storage.layout import ALIGN, SENTINEL_THRESHOLD

    nq_pad, d = queries.shape
    n_pad = vectors.shape[0]
    nb = n_pad // ALIGN

    q_sq = sq_norms(queries)
    # ALWAYS L2 (assignment-consistent cell probing; see gather path).
    dcoarse = _score(queries, centroids_ord, c_sq_ord, q_sq, "l2")
    sorted_coarse = jnp.sort(dcoarse, axis=1)
    thresh = jax.lax.dynamic_slice_in_dim(
        sorted_coarse, jnp.maximum(n_probe - 1, 0), 1, axis=1
    )
    s_ord = (dcoarse <= thresh).astype(jnp.float32)  # (nq_pad, kc)
    delta = s_ord - jnp.concatenate(
        [jnp.zeros((nq_pad, 1), jnp.float32), s_ord[:, :-1]], axis=1
    )
    wall = jnp.zeros((nq_pad, nb), jnp.float32)
    wall = wall.at[:, run_starts_b].add(delta)
    mask_b = (jnp.cumsum(wall, axis=1) > 0.5).astype(jnp.float32)
    # Pad the block mask to the kernel's grid width (tail lanes are also
    # masked in-kernel by the row iota, so zero-padding is safe).
    NB = _S * w
    nj = -(-n_pad // NB)
    mcols = nj * NB // ALIGN
    if mcols > nb:
        mask_b = jnp.pad(mask_b, ((0, 0), (0, mcols - nb)))

    vals, rows = flat_sweep_topk_plane(
        queries, vectors, row_norms, mask_b, vec_resid, scale_row,
        metric=metric, w=w, c_groups=c_groups, q_tile=q_tile,
        precision=precision, interpret=interpret,
    )
    # 3pass sweep (or the explicit int8 modes), no shortlist re-rank —
    # same precision contract and measured trade-offs as the flat fused
    # program (see its docstring).
    dv, pos = topk_smallest(vals, k)
    rsel = jnp.take_along_axis(rows, jnp.maximum(pos, 0), axis=1)
    if metric == "l2":
        dv = jnp.maximum(dv + q_sq[:, None], 0.0)
    real = jnp.isfinite(dv) & (dv < SENTINEL_THRESHOLD) & (pos >= 0)
    rsel = jnp.where(real, rsel, -1)
    dv = jnp.where(real, dv, jnp.inf)
    return dv, rsel


class IvfIndex:
    """Two-level IVF-Flat index with an HBM-resident posting layout."""

    def __init__(self, dimension: int, metric: str = "l2"):
        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unsupported metric: {metric}")
        self.dimension = int(dimension)
        self.metric = metric
        self.centroids = np.zeros((0, dimension), np.float32)
        self.centroids_to_shard = np.zeros(0, np.int32)
        self.num_shards = 0
        self.layout: Optional[PostingLayout] = None
        # Secondary assignments per vector (0 = reference-parity single
        # assignment; 1 = SOAR spill, search de-duplicates ids).
        self.spill = 0
        # Larger-than-HBM mode (offload_main_table): f32 table freed, int8
        # stream sweep + host re-rank.
        self.offloaded = False
        # Unbounded-corpus mode (to_host_resident / load resident='host'):
        # posting layout lives in host RAM; search stages probed cells only.
        self.host_resident = False
        # Host-side record columns, in *internal id* order.
        self.external_ids = np.zeros(0, np.uint64)
        self.timestamps = np.zeros(0, np.uint64)
        # Device-side centroid table (built lazily).
        self._dev = None
        # Stream-table dtype for method='stream' (bf16 halves the sweep's
        # HBM bytes; winners are re-ranked exactly in f32).
        self.stream_dtype = jnp.bfloat16
        self._stream_tables: dict = {}

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    @classmethod
    def fit(
        cls,
        store: VectorStore,
        seed: int = 42,
        nlist: Optional[int] = None,
        max_iters: Optional[int] = None,
        refine_iters: int = 2,
        metric: str = "l2",
        trainer: str = "lloyd",
        mesh=None,
        mesh_axis: str = "shards",
        spill: int = 0,
        spill_lambda: float = 1.0,
        balance: float = 1.0,
        train_sample: Optional[int] = None,
        resident: str = "device",
    ) -> "IvfIndex":
        if resident not in ("device", "host"):
            raise ValueError("resident must be 'device' or 'host'")
        n = len(store)
        if n == 0:
            raise ValueError("no vectors provided")
        data = store.get_vectors()
        if metric == "cosine":
            # Cosine reduces to inner product over unit vectors; stored
            # payloads are the normalized vectors.
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            data = (data / np.maximum(norms, 1e-12)).astype(np.float32)
        dim = data.shape[1]
        k = nlist if nlist is not None else calculate_num_clusters(n)
        k = max(1, min(k, n))
        iters = max_iters if max_iters is not None else calculate_max_iterations(n)
        log.info("ivf.fit: n=%d dim=%d nlist=%d max_iters=%d", n, dim, k, iters)
        data_host = data  # numpy, internal-id order (post normalization)

        # Default trainer is FULL-BATCH Lloyd: on the MXU a full assignment
        # sweep is a tiled matmul (~1 TFLOP/iter at n=1M, k=4000 — cents),
        # while the reference's CPU-era mini-batch operating point
        # (batch = clamp(sqrt(n), 10, 256), kmeans.rs:83) cannot train
        # nlist >> batch centroids: measured cluster-size skew E[l^2]/E[l]^2
        # = 86 at n=100k (p50 size 1, whales of 8.5k), which poisons every
        # probed-size-proportional search path. Lloyd brings skew to ~O(1).
        # trainer="mini_batch" retains the reference's algorithm as an option.
        # ``mesh``: data-parallel build over a device mesh — points sharded
        # along ``mesh_axis``, per-device assign + psum-reduced statistics,
        # DP final assignment (the TPU analogue of the reference training its
        # whole build under rayon, kmeans.rs:15-150). Single-device build is
        # the mesh=None degenerate case.
        if train_sample is not None and (trainer != "lloyd" or mesh is not None):
            raise ValueError(
                "train_sample is a full-batch Lloyd option (mini_batch is "
                "already subsampled; balanced/DP sweeps need every point)"
            )
        if resident == "host" and (
            trainer != "lloyd" or mesh is not None or spill
        ):
            raise ValueError(
                "resident='host' fit supports trainer='lloyd' without mesh "
                "or spill (the low-HBM build stages only a training sample "
                "and per-chunk assignment slices)"
            )
        with trace("fit.kmeans", n=n, k=k, mesh=(mesh is not None)):
            if mesh is not None:
                if trainer != "lloyd":
                    raise ValueError(
                        "mesh-parallel fit supports trainer='lloyd' (the "
                        "mini-batch step is batch-bound, not data-bound; DP "
                        "would shard a <=256-row batch)"
                    )
                from ..parallel.dp_kmeans import run_kmeans_lloyd_dp

                kres = run_kmeans_lloyd_dp(
                    data, k, iters, mesh=mesh, axis=mesh_axis, seed=seed,
                    spherical=(metric == "cosine"),
                )
            elif trainer == "lloyd" and resident == "host":
                # Low-HBM build for corpora near/past HBM capacity: ONLY a
                # seeded training subsample (faiss Clustering-style) and
                # fixed-size assignment slices are ever staged h2d; the
                # posting layout packs HOST-side and the index comes out
                # host-resident (staged serving / offload_from_host /
                # save_index all read the host mirror). Device peak ~1 GB
                # vs the device fit's whole-corpus + packed-table ~2.1x
                # corpus peak, which faulted the shared v5e at n=10M.
                from ..models.kmeans import run_kmeans_lloyd_host

                kres = run_kmeans_lloyd_host(
                    data_host, k, iters,
                    train_sample or min(n, 2_000_000), seed=seed,
                    spherical=(metric == "cosine"),
                )
            elif trainer == "lloyd":
                # Stage the corpus in HBM once: the trainer and the layout
                # build share the same device array (host packing +
                # re-upload of the (n, d) payload measured ~178 s of build
                # wall-clock at n=1M over this environment's tunnel).
                # ``train_sample`` caps the TRAINING sweep at a seeded
                # subsample (faiss Clustering-style, 256*k-ish); the final
                # full-corpus assignment stays exact.
                data = jnp.asarray(data)
                if train_sample is not None and train_sample < n:
                    from ..models.kmeans import run_kmeans_lloyd_sampled

                    kres = run_kmeans_lloyd_sampled(
                        data, k, iters, train_sample, seed=seed,
                        spherical=(metric == "cosine"),
                    )
                else:
                    kres = run_kmeans_lloyd(
                        data, k, iters, seed=seed,
                        spherical=(metric == "cosine"),
                    )
            elif trainer == "balanced":
                # Capacity-penalized Lloyd: bounds posting-list skew by
                # construction (``balance`` scales the occupancy penalty)
                # — tighter gather budgets / stream slot counts / shard
                # load balance, at a small recall-per-probe cost on data
                # where skewed cells act as partial flat scans.
                from ..models.kmeans import run_kmeans_balanced

                data = jnp.asarray(data)
                kres = run_kmeans_balanced(
                    data, k, iters, balance=balance, seed=seed,
                    spherical=(metric == "cosine"),
                )
            elif trainer == "mini_batch":
                kres = run_kmeans_mini_batch(
                    data, k, iters, seed=seed, refine_iters=refine_iters,
                    spherical=(metric == "cosine"),
                )
            else:
                raise ValueError(f"unknown trainer: {trainer}")
        log.info(
            "fit.kmeans: %d iterations, converged=%s", kres.iterations, kres.converged
        )
        centroids = np.asarray(kres.centroids)
        labels = np.asarray(kres.labels).astype(np.int64)

        # Spilled (multi-) assignment: each vector also joins its SOAR-picked
        # secondary cell. On near-isotropic data, balanced cells give a true
        # NN only ~40% odds of sharing a probed cell at nprobe=64/1268; a
        # second, orthogonality-weighted assignment roughly doubles coverage
        # per probe at the cost of 2x posting rows. Opt-in (default keeps the
        # reference's single-assignment semantics and its no-duplicate-ids
        # invariant; search de-duplicates when spill is on).
        entry_labels, point_ids = labels, None
        if spill:
            if spill != 1:
                raise ValueError("spill supports 0 or 1 secondary assignments")
            from ..ops.distance import assign_spill_chunked

            with trace("fit.spill", n=n):
                labels2 = np.asarray(
                    assign_spill_chunked(
                        data if isinstance(data, jax.Array)
                        else jnp.asarray(data_host),
                        jnp.asarray(centroids),
                        jnp.asarray(labels.astype(np.int32)),
                        soar_lambda=spill_lambda,
                    )
                ).astype(np.int64)
            entry_labels = np.concatenate([labels, labels2])
            point_ids = np.concatenate(
                [np.arange(n, dtype=np.int64)] * 2
            )

        # Super-centroid clustering over the (unfiltered) centroid table.
        num_shards = num_shards_for(k)
        super_seed = (seed * 31 + 7) % (2**63)
        if num_shards >= k:
            shard_labels_all = np.arange(k, dtype=np.int64) % num_shards
        else:
            with trace("fit.super_kmeans", k=k, shards=num_shards):
                sres = run_kmeans_lloyd(centroids, num_shards, 100, seed=super_seed)
            shard_labels_all = np.asarray(sres.labels).astype(np.int64)

        # Filter empty posting lists; densify centroid ids (order-preserving).
        counts = np.bincount(entry_labels, minlength=k)
        keep = np.flatnonzero(counts > 0)
        log.info(
            "ivf.fit: filtered %d empty lists, %d remain, %d shards",
            k - len(keep), len(keep), num_shards,
        )
        old_to_new = np.full(k, -1, np.int64)
        old_to_new[keep] = np.arange(len(keep))
        new_labels = old_to_new[entry_labels]

        idx = cls(dim, metric=metric)
        idx.spill = int(spill)
        idx.centroids = centroids[keep]
        idx.centroids_to_shard = shard_labels_all[keep].astype(np.int32)
        idx.num_shards = num_shards
        idx.external_ids = store.external_ids
        idx.timestamps = store.timestamps
        # Host mirror of the (possibly normalized) corpus in internal-id
        # order: lets persistence serialize shard payloads without fetching
        # the packed table back from HBM (~0.5 GB d2h at 1M — minutes over
        # this environment's tunnel).
        idx._host_data = data_host
        # Lay clusters of the same shard contiguously so multi-chip sharding
        # (and shard files) slice contiguous row ranges.
        cluster_order = np.argsort(idx.centroids_to_shard, kind="stable")
        with trace("fit.layout", n=n, clusters=len(keep)):
            idx.layout = build_layout(
                data_host if resident == "host" else data,
                new_labels, len(keep), cluster_order,
                point_ids=point_ids, device_put=resident != "host",
            )
        if resident == "host":
            idx.host_resident = True
        return idx

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    @property
    def num_clusters(self) -> int:
        return self.centroids.shape[0]

    def _device_tables(self):
        if self._dev is None:
            c = jnp.asarray(self.centroids, jnp.float32)
            self._dev = (c, sq_norms(c))
        return self._dev

    def _stream_table(self, dtype):
        """CHUNK-aligned stream table for the block-stream kernel (built
        lazily per dtype; one-time device re-pack of the posting table)."""
        dtype = jnp.dtype(dtype)
        if dtype not in self._stream_tables:
            from ..ops.pallas.block_stream import build_stream_table

            with trace("stream_table.build", dtype=str(dtype)):
                self._stream_tables[dtype] = build_stream_table(
                    self.layout, self.centroids, dtype
                )
        return self._stream_tables[dtype]

    def offload_main_table(self, stream_dtype=None, rerank: str = "host") -> None:
        """Larger-than-HBM serving: free the f32 main table (+ norms) and
        serve from a compact quantized stream table. ``rerank``: 'host'
        exact host re-rank / 'device' two-layer corrected re-rank on
        device / 'none' raw quantized ranking. Full contract + measured
        economics: index/offload.py::offload_main_table."""
        return _offload.offload_main_table(self, stream_dtype, rerank)

    def offload_from_host(self, stream_dtype=None, rerank: str = "host") -> None:
        """Offload entry for HOST-staged layouts (``load_index_from(...,
        resident='offload')``): tables quantized on the host, only the
        compact arrays uploaded — the f32 corpus never touches HBM. Full
        contract: index/offload.py::offload_from_host."""
        return _offload.offload_from_host(self, stream_dtype, rerank)


    def to_host_resident(self, stage_dtype=None) -> None:
        """Unbounded-corpus serving mode: move the posting layout to HOST
        memory and free its device residency entirely; searches stage only
        the probed cells' posting blocks per batch (index/staged.py — the
        TPU analogue of the reference's disk-resident selective reads,
        /root/reference/src/shards.rs:188-349). HBM then holds just the
        centroid table plus one batch's staging buffer, so corpus capacity
        is bounded by host RAM, not the 16 GB of HBM.

        ``stage_dtype`` (or setting ``self.stage_dtype``; float32 default)
        selects the staging precision: bfloat16 / int8 shrink the
        per-batch h2d payload 2x/4x — the staged path's bottleneck — with
        a widened device shortlist re-ranked exactly on the host.

        Prefer ``load_index_from(..., resident='host')``, which never
        stages the table to the device at all; this method additionally
        serves indexes just built on-device (it must fetch the table d2h
        once — minutes at 1M over this environment's tunnel, seconds over
        PCIe on a TPU VM)."""
        if self.layout is None:
            raise RuntimeError("index is empty: fit or load it first")
        if getattr(self, "offloaded", False):
            raise RuntimeError(
                "index is offloaded (main table freed); reload it before "
                "switching to host-resident serving"
            )
        lay = self.layout
        for name in ("vectors", "row_norms", "offsets", "lengths"):
            arr = getattr(lay, name)
            if isinstance(arr, jax.Array):
                host = np.asarray(arr)
                arr.delete()
                setattr(lay, name, host)
        # Free derived device caches that reference the old table.
        for dt in list(self._stream_tables):
            for leaf in jax.tree_util.tree_leaves(self._stream_tables[dt]):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            del self._stream_tables[dt]
        self._runs = None
        self._budget_cache = {}
        if stage_dtype is not None:
            self.stage_dtype = jnp.dtype(stage_dtype)
        self.host_resident = True
        log.info(
            "host-resident mode: %d rows in host RAM, HBM holds centroids "
            "only", lay.vectors.shape[0],
        )

    def choose_method(self, nq: int, n_probe: int) -> str:
        """Resolve 'auto' to a concrete method for this (nq, n_probe).

        Delegates to ``choose_sweep_body`` — the calibrated expected-bytes
        model shared with the mesh searchers (see its docstring for the
        measured truth table: dense wins whole-table sweeps up to ~100k
        rows at any nprobe and beyond ~2.4 MB/query of probed bytes;
        stream wins the large-corpus low-nprobe regime, e.g. 93k vs 56k
        qps at n=512k nprobe=4). Within the stream branch the fused-
        selection kernel engages itself at >=12k probed rows/query
        (block_stream.FUSED_STREAM_MIN_ROWS); only at ENORMOUS footprints
        (>= SHARED_MIN_PROBED_ROWS rows/query at nq >= SHARED_MIN_NQ)
        does the block-major shared kernel still take over — the
        2026-08-19 3-arm A/Bs measured shared/fused 1.25-1.27x at 617k
        rows/query but 0.59-0.92 everywhere at or below 319k
        (bench_results/fused_stream_ab/shared_corner*). That corner needs
        the probed FRACTION to stay small enough that dense doesn't win
        first — very large corpora or explicit small-nlist layouts.
        Exposed publicly so the bench harness can report which concrete
        path an 'auto' sweep point ran."""
        if getattr(self, "host_resident", False):
            return "staged"
        from ..ops.pallas.block_stream import pick_chunk

        lay = self.layout
        d = self.dimension
        n_probe = min(n_probe, self.num_clusters)
        itemsize = jnp.dtype(self.stream_dtype).itemsize
        lengths = np.asarray(lay.lengths)
        if getattr(self, "offloaded", False):
            # Only the stream kernels can serve (no f32 table). The shared
            # upgrade applies at huge probed footprints, but ONLY under a
            # re-ranked mode ('host' or 'device'): there the >=128-wide
            # shortlist re-ranked makes the kernels result-equivalent
            # (measured identical sets), while the rank-only mode returns
            # the raw width-k plane where shared's selection is measurably
            # lossier (set-overlap@10 0.947 vs stream 0.972 on a 12-blob
            # d=64 corpus, R@1=1.0 both).
            chunk = pick_chunk(lengths, d, itemsize)
            if getattr(self, "_offload_rerank", "host") in (
                "host", "device",
            ) and (
                shared_gate(nq, n_probe, mean_slot_rows_of(lengths, chunk))
            ):
                return "stream_shared"
            return "stream"
        chunk = pick_chunk(lengths, d, itemsize)
        return choose_sweep_body(
            lengths, lay.vectors.shape[0], d, itemsize, nq, n_probe, chunk,
            allow_shared=True,
        )

    def _budget_for(self, n_probe: int) -> int:
        """Static packed-gather budget for n_probe (cached; exact, never
        truncates: sum of the n_probe longest posting lists)."""
        cache = getattr(self, "_budget_cache", None)
        if cache is None:
            cache = self._budget_cache = {}
        if n_probe not in cache:
            cache[n_probe] = candidate_budget(
                np.asarray(self.layout.lengths), n_probe
            )
        return cache[n_probe]

    def search_batch(
        self,
        queries: np.ndarray,
        k: int,
        n_probe: int,
        method: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched search: (nq, d) -> (D (nq, k) f32, I_internal (nq, k) i64).

        Missing slots (fewer than k candidates) are padded D=+inf, I=-1 —
        the bindings' (D, I) contract (bindings/python/src/lib.rs:179-187).

        ``method``: 'gather' (packed-CSR candidate gather, best at small
        batch), 'dense' (masked full matmul, best at large batch), 'stream'
        (probed-blocks Pallas sweep, best at large corpus), 'flat'
        (exhaustive), or 'auto'. The *_exact variants are equivalent result
        sets; the fast variants differ legitimately — 'dense' probes every
        cluster tied at the n_probe-th coarse distance and the fast paths use
        hardware approximate selection (recall_target 0.99), 'stream' ranks
        in reduced precision before the exact re-rank.
        """
        if getattr(self, "host_resident", False):
            if method not in ("auto", "staged"):
                raise RuntimeError(
                    "host-resident index serves method='staged' only (the "
                    "posting layout lives in host RAM; the device-resident "
                    "paths need it staged in HBM — reload with "
                    "resident='device' to restore them)"
                )
            if k <= 0:
                raise ValueError("k must be > 0")
            if n_probe <= 0:
                raise ValueError("n_probe must be > 0")
            from .staged import staged_search

            return staged_search(self, queries, k, n_probe)
        if getattr(self, "offloaded", False):
            rr = getattr(self, "_offload_rerank", "host")
            if rr == "host":
                return self._search_offloaded(queries, k, n_probe)
            if rr == "device":
                return self._search_offloaded_device(queries, k, n_probe)
        dvals, irows = self.search_batch_device(queries, k, n_probe, method)
        nq = queries.shape[0] if queries.ndim == 2 else 1
        dvals = np.asarray(dvals)[:nq]
        irows = np.asarray(irows)[:nq]
        lay = self.layout
        # Map layout rows -> internal ids on host (cheap: nq*k). Alignment
        # gap rows carry perm == -1 and can't appear as results anyway.
        bound = max(lay.rows_used - 1, 0)
        internal = np.where(irows >= 0, lay.perm[np.clip(irows, 0, bound)], -1)
        return dvals, internal.astype(np.int64)

    def _search_offloaded(self, queries, k: int, n_probe: int):
        """Offload rerank='host' search (index/offload.py)."""
        return _offload.search_offloaded(self, queries, k, n_probe)

    def _search_offloaded_device(self, queries, k: int, n_probe: int):
        """Offload rerank='device' search (index/offload.py)."""
        return _offload.search_offloaded_device(self, queries, k, n_probe)

    def _offload_rerank_piece(self, queries, rows, k: int, spill: int):
        """Host half of the offloaded rerank='host' search (index/offload.py)."""
        return _offload.offload_rerank_piece(self, queries, rows, k, spill)


    def _perm_dev_table(self):
        """Device int32 map layout row -> internal id (-1 on gap/tail rows),
        for on-device dedup of spilled results. Cached per layout object."""
        lay = self.layout
        if getattr(self, "_perm_dev", None) is None or self._perm_dev_lay is not lay:
            n_pad = (
                lay.vectors.shape[0]
                if lay.vectors is not None
                else self._n_pad
            )
            pd = np.full(n_pad, -1, np.int64)
            pd[: lay.rows_used] = lay.perm
            self._perm_dev = jnp.asarray(pd, jnp.int32)
            self._perm_dev_lay = lay
        return self._perm_dev

    def _sweep_int8_tables(self):
        """Fixed-point int8 twin of the layout table for the int8 fused
        sweeps (methods 'flat_int8'/'dense_int8' and their x1 variants):
        (x8, r8, scales) from quantize_table_int8, built on device once
        per layout object (~n*d*2 bytes HBM alongside the f32 table)."""
        lay = self.layout
        if (
            getattr(self, "_sweep_q", None) is None
            or self._sweep_q_lay is not lay
        ):
            from ..ops.pallas.flat_sweep import quantize_table_int8

            self._sweep_q = quantize_table_int8(lay.vectors)
            self._sweep_q_lay = lay
        return self._sweep_q

    def search_batch_device(
        self,
        queries: np.ndarray,
        k: int,
        n_probe: int,
        method: str = "auto",
        _raw: bool = False,
    ):
        """Device-side search returning jax arrays (D, layout_rows) of shape
        (nq_pad, k) — no device->host transfer (bench/serving hot path).

        On spilled indexes a vector can appear in up to 1+spill probed
        cells; the underlying program then runs at width (1+spill)*k and an
        on-device pass drops duplicate ids before the final top-k."""
        if self.layout is None or self.num_clusters == 0:
            raise RuntimeError("index is empty: fit or load it first")
        if k <= 0:
            raise ValueError("k must be > 0")
        if n_probe <= 0:
            raise ValueError("n_probe must be > 0")
        if getattr(self, "host_resident", False):
            raise RuntimeError(
                "host-resident index has no device-resident layout; use "
                "search_batch (method='staged')"
            )
        if getattr(self, "offloaded", False):
            if method == "auto":
                # nq must reflect the POST-reshape batch: a single (d,)
                # query is nq=1, not nq=d (at d>=1024 the raw dim would
                # pass SHARED_MIN_NQ and mis-pick the shared kernel).
                nq_eff = (
                    queries.shape[0]
                    if getattr(queries, "ndim", 1) > 1
                    else 1
                )
                method = self.choose_method(nq_eff, n_probe)
            if method not in ("stream", "stream_shared"):
                raise RuntimeError(
                    "offloaded index serves the stream kernels only (the "
                    "f32 main table was freed; dense/flat/gather/exact "
                    "paths need it — reload the index to restore them)"
                )
        if getattr(self, "spill", 0) and not _raw:
            kk = (1 + self.spill) * k
            dv, rows = self.search_batch_device(
                queries, kk, n_probe, method, _raw=True
            )
            return _dedup_topk(dv, rows, self._perm_dev_table(), k=k)
        staged = isinstance(queries, jax.Array)
        if not staged:
            queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, d = queries.shape
        if d != self.dimension:
            raise ValueError(
                f"query dimension mismatch: expected {self.dimension}, got {d}"
            )

        metric = self.metric if self.metric != "cosine" else "ip"

        def pad_to(q_tile):
            # Pre-staged device queries (serving hot loop) pad on device; the
            # numpy path pads host-side before the single h2d transfer.
            nq_pad = _round_up(nq, q_tile)
            if staged:
                q = queries
                if self.metric == "cosine":
                    q = q / jnp.maximum(
                        jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12
                    )
                if nq_pad == nq:
                    return q  # already tile-aligned: zero extra dispatches
                return jnp.pad(q, ((0, nq_pad - nq), (0, 0)))
            q = queries
            if self.metric == "cosine":
                q = q / np.maximum(
                    np.linalg.norm(q, axis=1, keepdims=True), 1e-12
                )
            qp = np.zeros((nq_pad, d), np.float32)
            qp[:nq] = q
            return jnp.asarray(qp)

        n_probe = min(n_probe, self.num_clusters)
        lay = self.layout
        # ONE decision path (index/dispatch.py::resolve, shared with the
        # bench harness's work accounting): resolves 'auto', applies every
        # fused-routing gate and feasibility fallback, and sizes the
        # program statically. This dispatcher only binds the Decision to
        # the concrete jitted programs.
        dec = resolve(self, nq, n_probe, k=k, method=method)

        centroids, c_sq = self._device_tables()
        if dec.program == "flat_fused":
            w, q_tile, c_groups = dec.plan
            if dec.precision in ("int8", "int8x1"):
                # faiss-SQ8-style approximate operating points
                # ('flat_int8'/'flat_int8x1'): 3 int8 MXU passes (~1.5
                # bf16-pass-equivalents, isotropic R@10 ~0.999) or ONE
                # (~6x less MXU, R@10 ~0.98) vs the serving default's 6.
                x8, r8, srow = self._sweep_int8_tables()
                return _flat_search_fused_program(
                    pad_to(q_tile), x8, lay.row_norms,
                    r8 if dec.precision == "int8" else None, srow,
                    k=k, q_tile=q_tile, w=w, c_groups=c_groups,
                    metric=metric, precision=dec.precision,
                )
            # Fused Pallas sweep: same exact distances, selection via the
            # on-chip top-2 accumulator plane + a narrow top_k.
            return _flat_search_fused_program(
                pad_to(q_tile), lay.vectors, lay.row_norms,
                k=k, q_tile=q_tile, w=w, c_groups=c_groups, metric=metric,
            )
        if dec.program == "flat_xla":
            return _flat_search_program(
                pad_to(dec.q_tile), lay.vectors, lay.row_norms,
                k=k, q_tile=dec.q_tile, approx=dec.approx, metric=metric,
            )
        if dec.program == "dense_fused":
            w, q_tile, c_groups = dec.plan
            run_starts_b, centroids_ord, c_sq_ord = self._run_tables()
            if dec.precision in ("int8", "int8x1"):
                x8, r8, srow = self._sweep_int8_tables()
                return _ivf_search_dense_fused_program(
                    pad_to(q_tile), centroids_ord, c_sq_ord, x8,
                    lay.row_norms, run_starts_b, jnp.int32(n_probe),
                    r8 if dec.precision == "int8" else None, srow,
                    k=k, q_tile=q_tile, w=w, c_groups=c_groups,
                    metric=metric, precision=dec.precision,
                )
            return _ivf_search_dense_fused_program(
                pad_to(q_tile), centroids_ord, c_sq_ord, lay.vectors,
                lay.row_norms, run_starts_b, jnp.int32(n_probe),
                k=k, q_tile=q_tile, w=w, c_groups=c_groups, metric=metric,
            )
        if dec.program == "dense_xla":
            run_starts_b, centroids_ord, c_sq_ord = self._run_tables()
            return _ivf_search_dense_program(
                pad_to(dec.q_tile), centroids_ord, c_sq_ord, lay.vectors,
                lay.row_norms, run_starts_b, jnp.int32(n_probe),
                k=k, q_tile=dec.q_tile, approx=dec.approx, metric=metric,
            )
        if dec.program in ("stream", "stream_shared"):
            shared = dec.program == "stream_shared"
            st = self._stream_table(
                jnp.float32 if dec.exact else self.stream_dtype
            )
            chunk, t_fixed, q_tile, t_cap = (
                dec.chunk, dec.t_fixed, dec.q_tile, dec.t_cap,
            )
            if st.chunk != chunk:
                # The Decision sizes against pick_chunk's deterministic
                # twin of the built table; a table built under an explicit
                # chunk override disagrees — re-derive against the REAL
                # table so the task grid matches its blocks.
                chunk, t_fixed, q_tile, t_cap = stream_params(
                    np.asarray(lay.lengths), d,
                    jnp.dtype(st.dtype).itemsize, nq, n_probe,
                    exact=dec.exact, shared=shared, chunk=st.chunk,
                )
            offloaded = getattr(self, "offloaded", False)
            return _ivf_search_stream_program(
                pad_to(q_tile),
                centroids,
                c_sq,
                st,
                # Offloaded: the f32 main table is gone; selection runs on
                # the compact table and the exact re-rank happens host-side
                # (search_batch). The placeholders are dead args under
                # rerank=False.
                st.norms if offloaded else lay.vectors,
                st.norms if offloaded else lay.row_norms,
                k=k,
                n_probe=n_probe,
                t_fixed=t_fixed,
                q_tile=q_tile,
                approx=not dec.exact,
                rerank=(
                    st.dtype != jnp.float32
                    and not offloaded
                    and _stream_rerank_wanted(st.dtype)
                ),
                metric=metric,
                shared=shared,
                t_cap=t_cap,
                interpret=jax.default_backend() == "cpu",
            )
        if dec.program == "gather_dma":
            # Range-DMA Pallas kernel: one contiguous HBM->VMEM DMA per
            # probed posting list (the hardware analogue of the reference's
            # io_uring cluster-block reads, shards.rs:255-272). Wins over the
            # XLA row-gather at moderate batch; experimental default-off.
            from ..ops.pallas.ivf_gather import ivf_gather_distances

            qdev = pad_to(8)
            dcoarse = (
                sq_norms(qdev)[:, None]
                - 2.0 * jnp.dot(qdev, centroids.T,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                + c_sq[None, :]
            )
            probe = jax.lax.top_k(-dcoarse, n_probe)[1]
            starts = lay.offsets[:-1][probe]
            lens = lay.lengths[probe]
            dist, rows = ivf_gather_distances(
                qdev, lay.vectors, starts, lens,
                max_len=max(1, lay.max_list_len), budget=dec.budget,
                metric=metric,
                interpret=jax.default_backend() == "cpu",
            )
            dvals, ci = topk_smallest(dist, k)
            rsel = jnp.take_along_axis(rows, jnp.maximum(ci, 0), axis=1)
            rsel = jnp.where((ci >= 0) & jnp.isfinite(dvals), rsel, -1)
            return dvals, rsel
        # dec.program == 'gather' (resolve raised on unknown/'staged').
        return _ivf_search_program(
            pad_to(dec.q_tile),
            centroids,
            c_sq,
            lay.vectors,
            lay.row_norms,
            lay.offsets[:-1],
            lay.lengths,
            k=k,
            n_probe=n_probe,
            budget=dec.budget,
            q_tile=dec.q_tile,
            metric=metric,
        )

    def _run_tables(self):
        """(run_start_blocks, centroids_ord, c_sq_ord): contiguous posting
        runs in layout order (block-granular starts), with the centroid
        table reordered to match."""
        if getattr(self, "_runs", None) is None:
            from ..storage.layout import ALIGN

            starts = np.asarray(self.layout.offsets)[:-1]
            order = np.argsort(starts, kind="stable")
            c_ord = jnp.asarray(self.centroids[order], jnp.float32)
            self._runs = (
                jnp.asarray((starts[order] // ALIGN).astype(np.int32)),
                c_ord,
                sq_norms(c_ord),
            )
        return self._runs

    def search(
        self, query: np.ndarray, k: int, n_probe: int
    ) -> list[tuple[int, float, np.ndarray]]:
        """Single-query convenience: list of (external_id, distance, vector),
        sorted ascending, only real hits (parity with ivf_index.rs search
        returning (usize, f32, Vec<f32>) triples)."""
        dvals, internal = self.search_batch(np.asarray(query)[None, :], k, n_probe)
        out = []
        for dist, iid in zip(dvals[0], internal[0]):
            if iid < 0 or not np.isfinite(dist):
                continue
            row = int(iid)
            out.append(
                (int(self.external_ids[row]), float(dist), self._vector_of(row))
            )
        return out

    def _vector_of(self, internal_id: int) -> np.ndarray:
        lay = self.layout
        if lay.vectors is None:
            # Offloaded table (device- or host-built): the f32 rows live only
            # in the host mirror, which is internal-id ordered.
            host = getattr(self, "_host_data", None)
            if host is None:
                raise RuntimeError(
                    "result vectors unavailable: main table offloaded and no "
                    "host mirror present"
                )
            return np.asarray(host[internal_id], np.float32)
        # perm maps layout row -> internal id; invert for payload fetch. After
        # a partial load (missing shard) internal ids can exceed lay.n, so the
        # inverse is sized by the id space, not the row count. The cache pins
        # the layout object itself and compares with `is`: an id()-keyed cache
        # could serve a stale inverse if a replaced layout were garbage
        # collected and a new one allocated at the same address.
        if getattr(self, "_perm_inv", None) is None or self._perm_inv_lay is not lay:
            size = int(lay.perm.max()) + 1 if lay.n else 0
            inv = np.full(size, -1, np.int64)
            real = lay.perm >= 0
            inv[lay.perm[real]] = np.flatnonzero(real)
            self._perm_inv = inv
            self._perm_inv_lay = lay
        row = self._perm_inv[internal_id]
        if row < 0:
            raise KeyError(f"internal id {internal_id} not present in layout")
        return np.asarray(lay.vectors[row])

    # ------------------------------------------------------------------
    # Persistence (delegates to storage.persist)
    # ------------------------------------------------------------------

    def save_to(self, index_dir, shards_dir=None) -> None:
        from ..storage import persist

        persist.save_index(self, index_dir, shards_dir)

    def save_shards_to(self, shards_dir) -> None:
        from ..storage import persist

        persist.save_shards(self, shards_dir)


def load_index_from(
    index_dir,
    shards_dir=None,
    resident: str = "device",
    offload_rerank: str = "host",
) -> IvfIndex:
    """Load index metadata (+ posting layout from shard files when given).

    ``resident='host'`` keeps the layout in host RAM (unbounded-corpus
    serving via per-batch probed-cell staging, index/staged.py);
    ``resident='offload'`` uploads only a host-quantized int8 stream table
    (full-throughput device serving for f32 tables larger than HBM,
    IvfIndex.offload_from_host); ``offload_rerank`` picks its shortlist
    re-rank: 'host' exact / 'device' two-layer corrected / 'none'."""
    from ..storage import persist

    return persist.load_index(
        index_dir, shards_dir, resident=resident,
        offload_rerank=offload_rerank,
    )
