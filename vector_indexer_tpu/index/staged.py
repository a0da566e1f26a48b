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
    return staged_vecs, staged_norms, sub_starts, alens, staged_to_orig, r_used


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "approx", "metric")
)
def _staged_quant_program(
    queries, cent_ord, csq_ord, vecs_q, scale_row, cell_row, norms,
    run_starts_b, n_probe, *, k, q_tile, approx, metric,
):
    """Quantized-staging sweep: dequantize the staged buffer on device
    (bf16: cast; int8: per-row scale x codes + the row's cell centroid —
    the codes are RESIDUALS, see staged_search) and run the same
    masked-dense body. Halves (bf16) or quarters (int8) the per-batch h2d
    bytes — the staged path's actual bottleneck on PCIe — at the cost of
    approximate ranking; the exact host re-rank of the widened shortlist
    restores exact distances (same contract as the int8 offload mode)."""
    from .ivf import _ivf_search_dense_program

    v = vecs_q.astype(jnp.float32)
    if scale_row is not None:
        # int8 codes hold (x - c_cell)/s_cell: residual encoding keeps the
        # error proportional to the cluster spread, not |x| (offload-mode
        # parity — build_stream_table's rationale). Reconstruct absolute
        # rows for the dense body; `norms` already holds |x_hat|^2 of the
        # SAME reconstruction, so device distances are consistent.
        v = v * scale_row[:, None] + cent_ord[cell_row]
    return _ivf_search_dense_program.__wrapped__(
        queries, cent_ord, csq_ord, v, norms, run_starts_b, n_probe,
        k=k, q_tile=q_tile, approx=approx, metric=metric,
    )


def _rerank_exact_host(lay, q, orig_rows, internal, metric):
    """Exact distances for a (nq, kk) shortlist, straight from the
    host-resident layout rows (batched BLAS matmul over the gathered
    block — measured ~2x an elementwise multiply+reduce, mirroring
    _search_offloaded's economics)."""
    cand = lay.vectors[np.maximum(orig_rows, 0)]  # (nq, kk, d) f32
    cross = np.matmul(cand, q[:, :, None])[..., 0]
    if metric == "l2":
        exact = np.maximum(
            (q**2).sum(1)[:, None]
            - 2.0 * cross
            + lay.row_norms[np.maximum(orig_rows, 0)],
            0.0,
        )
    else:
        exact = -cross
    return np.where(internal >= 0, exact, np.inf).astype(np.float32)


def staged_search(idx, queries, k: int, n_probe: int):
    """Search a host-resident index: coarse on device, probed-cell staging
    h2d, masked-dense sweep on the staged sub-table. Returns (D, I) with
    the standard +inf/-1 padding contract; on spilled indexes the program
    runs (1+spill)x wide and duplicates are dropped host-side.

    ``idx.stage_dtype`` (float32 default) selects the staging precision:
    bfloat16 / int8 (per-cell symmetric scales) quantize the h2d payload
    2x/4x smaller, rank approximately on device, and re-rank the widened
    shortlist exactly on the host — the same exactness contract as the
    int8 offload mode (offload_main_table)."""
    from .ivf import (
        _host_dedup_topk,
        _host_topk,
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
    sd = jnp.dtype(getattr(idx, "stage_dtype", jnp.float32))
    if sd == jnp.float32:
        wide = 1
    elif sd == jnp.bfloat16:
        wide = 2
    elif sd == jnp.int8:
        wide = 4
    else:
        raise ValueError(f"unsupported stage_dtype: {sd}")
    # Quantized staging ranks approximately: widen the device shortlist
    # (same policy as the int8 offload mode) for the exact host re-rank.
    kk = (1 + spill) * (
        k if wide == 1 else min(max(wide * k, 32 * wide), 4096)
    )

    # Quantize the query axis so consecutive batches of nearby sizes hit
    # one compile of the coarse and sweep programs (compiles cost 3-300 s
    # over this environment's backend). Pads are COPIES of the first
    # query: they add no cells to the probe union (zero-padding would
    # spuriously stage the cells nearest the origin).
    nq_q = max(8, quantize_up(nq))
    qq = np.repeat(q[:1], nq_q, axis=0)
    qq[:nq] = q

    centroids, c_sq = idx._device_tables()
    with trace("staged.coarse", nq=nq, n_probe=n_probe):
        mask = np.asarray(
            _coarse_probe_mask(jnp.asarray(qq), centroids, c_sq,
                               jnp.int32(n_probe))
        )[:nq]
    union = np.flatnonzero(mask.any(axis=0))
    # Zero-length cells (possible after a partial load) stage nothing —
    # drop them so the pack's per-cell segments stay well-formed.
    union = union[np.asarray(lay.lengths)[union] > 0]
    # Layout order keeps the pack a sequence of forward slices (and makes
    # the staged buffer deterministic for a given probe set).
    starts_all = np.asarray(lay.offsets)[:-1]
    union = union[np.argsort(starts_all[union], kind="stable")]

    with trace("staged.pack", cells=len(union)):
        (staged_vecs, staged_norms, sub_starts, alens, staged_to_orig,
         r_used) = _pack_stage(lay, union, d)
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

    q_tile = pick_q_tile(nq_q, max(r_pad * 4 // d, 1), d)
    nq_pad = _round_up(nq_q, q_tile)
    qp = np.repeat(q[:1], nq_pad, axis=0)
    qp[:nq] = q

    # Work accounting hook (harness reads it after a search).
    idx._last_stage_bytes = (
        r_pad * d * sd.itemsize + r_pad * 4 + (r_pad * 8 if wide == 4 else 0)
    )  # payload + norms (+ int8: per-row scale f32 + cell id i32)

    common = dict(
        k=min(kk, r_pad), q_tile=q_tile, approx=lay.n > 50_000, metric=metric
    )
    with trace("staged.sweep", rows=r_pad, cells=len(union), dtype=str(sd)):
        if wide == 1:
            dv, rows = _ivf_search_dense_program(
                jnp.asarray(qp),
                jnp.asarray(cent_ord),
                jnp.asarray(csq_ord),
                jnp.asarray(staged_vecs),
                jnp.asarray(staged_norms),
                jnp.asarray(run_starts_b),
                jnp.int32(n_probe),
                **common,
            )
        else:
            if wide == 2:  # bfloat16: host-side cast, h2d payload halves
                import ml_dtypes

                payload = staged_vecs.astype(ml_dtypes.bfloat16)
                scale_dev = cell_dev = None
                norms_dev = jnp.asarray(staged_norms)
            else:
                # int8 quantizes RESIDUALS (x - c_cell) with per-cell
                # symmetric scales — offload-mode parity
                # (ops/pallas/block_stream.build_stream_table): absolute-row
                # quantization would scale the error with |x| instead of
                # the cluster spread, collapsing recall on far-from-origin
                # data. Norms are recomputed for the DEQUANTIZED rows so
                # the device distance is the exact distance to x_hat.
                scale_row = np.ones(r_pad, np.float32)
                cell_row = np.zeros(r_pad, np.int32)
                payload = np.zeros((r_pad, d), np.int8)
                norms_q = staged_norms.copy()
                if r_used:
                    cell_row[:r_used] = np.repeat(
                        np.arange(len(union), dtype=np.int32), alens
                    )
                    real = staged_norms[:r_used] < 1e29
                    res = staged_vecs[:r_used] - cent_ord[cell_row[:r_used]]
                    absrow = np.abs(res).max(1) * real
                    cell_max = np.maximum.reduceat(absrow, sub_starts)
                    scale_c = np.maximum(cell_max / 127.0, 1e-30)
                    scale_row[:r_used] = np.repeat(scale_c, alens)
                    q8 = np.clip(
                        np.round(res / scale_row[:r_used, None]), -127, 127
                    )
                    payload[:r_used] = q8.astype(np.int8)
                    deq = (
                        q8 * scale_row[:r_used, None]
                        + cent_ord[cell_row[:r_used]]
                    )
                    norms_q[:r_used] = np.where(
                        real, (deq * deq).sum(1), staged_norms[:r_used]
                    )
                scale_dev = jnp.asarray(scale_row)
                cell_dev = jnp.asarray(cell_row)
                norms_dev = jnp.asarray(norms_q)
            dv, rows = _staged_quant_program(
                jnp.asarray(qp),
                jnp.asarray(cent_ord),
                jnp.asarray(csq_ord),
                jnp.asarray(payload),
                scale_dev,
                cell_dev,
                norms_dev,
                jnp.asarray(run_starts_b),
                jnp.int32(n_probe),
                **common,
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
    if wide > 1:
        # Quantized device ranking: exact re-rank of the widened shortlist
        # from the host layout, then dedup (spill only) + final k cut.
        with trace("staged.rerank", kk=dv.shape[1]):
            exact = _rerank_exact_host(lay, q, orig_rows, internal, metric)
        if spill:
            return _host_dedup_topk(exact, internal, k)
        return _host_topk(exact, internal, k)
    if spill:
        return _host_dedup_topk(dv, internal, k)
    if dv.shape[1] > k:  # kk was clamped to r_pad but may still exceed k
        dv, internal = dv[:, :k], internal[:, :k]
    if dv.shape[1] < k:  # tiny staged buffer clamped kk below k: pad out
        padc = k - dv.shape[1]
        dv = np.pad(dv, ((0, 0), (0, padc)), constant_values=np.inf)
        internal = np.pad(internal, ((0, 0), (0, padc)), constant_values=-1)
    return dv, internal.astype(np.int64)
