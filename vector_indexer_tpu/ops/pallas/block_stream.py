"""Block-stream IVF search kernel: probed-blocks-only distance sweep.

THE kernel that makes IVF probing pay on TPU. The dense path
(ivf.py:_ivf_search_dense_program) sweeps the FULL table and masks, spending
all the FLOPs/bytes IVF is supposed to save; the XLA row-gather path pays
~8 GB/s scatter-gather bandwidth. This kernel touches exactly the probed
posting blocks at bulk-sequential HBM bandwidth, by driving Mosaic's built-in
block pipeline with scalar-prefetched block ids — the TPU-native analogue of
the reference's selective io_uring cluster-block reads
(/root/reference/src/shards.rs:255-272) and its concurrent fan-out
(/root/reference/src/ivf_index.rs:249).

Mechanism
---------
* A **stream table**: the posting table re-packed so every cluster starts at
  a CHUNK-row-aligned base (built once from the main ALIGN=8 layout; the main
  table stays compact for the flat/dense paths), storing RESIDUALS
  (vector - its cluster centroid). The sweep is bandwidth-bound, so a bf16
  table doubles throughput; residual encoding keeps bf16's relative error
  proportional to the cluster spread instead of the data's absolute
  magnitude (global-mean centering measured 76% top-10 overlap on tight
  far-from-origin clusters; residuals recover ~100%), and the kernel keeps
  the large terms (|q-c|^2, norms) in exact f32. Exact f32 re-ranking of a
  2k shortlist from the main table finishes the job.
* Each probed list becomes ceil(len/CHUNK) **tasks**; each task is one
  (CHUNK, d) block. Every query gets exactly `t_fixed` task slots (nearest
  probes first; chunks beyond t_fixed — the farthest probed ones — are
  dropped, a graceful recall trade sized by the ~1.25x-expected default;
  `worst_case=True` never drops). The (query, slot) -> grid-step mapping is
  STATIC (fan f owns slot range [f*t_sub, (f+1)*t_sub); step t serves query
  t % nq at local slot t // nq), so the qid/slot index maps are computed
  from t and only block/cluster ids are scalar-prefetched — a scatter-based
  dynamic packing variant measured ~6 ms/kilobatch of pure XLA scatter cost,
  all of which this removes. FAN blocks per grid step amortize Mosaic's
  per-step overhead; measured ~340 GB/s effective at FAN=4 vs ~8 GB/s XLA
  row gather and ~20 GB/s for a manual DMA loop.
* Per-task masking/output init all happen OUTSIDE the kernel: distances land
  in per-(query, slot) output blocks; lanes beyond a list's end and unused
  slots are inf-masked in XLA before selection (garbage is never read
  unmasked).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # default rows per task block (lane-aligned packed output slots)
# Block fetches per grid step (amortizes per-step overhead). A/B on v5e at
# n=1M (same time window): 16 beats 8 by 10-13% at nprobe 4/16, ties at 8.
FAN = 16
# SMEM holds the scalar-prefetch task arrays (block id i32 + int8 dequant
# scale f32 + bias f32 = 12 B/task; the fused-selection kernel adds a valid
# -lane count i32 = 16 B/task); budget ~480 KB — under half of the v5e's
# ~1 MB SMEM at the fused width.
SMEM_TASK_CAP = 30_720
# Probed rows/query above which the fused-selection stream kernel wins:
# the materialized plane's XLA selection cost crosses the fused kernel's
# extra accumulator work between 8k and 16k columns (2026-08-19 real-chip
# A/Bs at n=2M, bench_results/fused_stream_ab: fused/unfused = 0.84-0.97
# at 4k-8k rows/q, 1.07-1.30 at 16k-32k, same boundary for bf16 and int8
# tables).
FUSED_STREAM_MIN_ROWS = 12 << 10
# Measured per-task fixed cost on v5e: ~200 ns regardless of block bytes
# (an all-same-block run — zero new HBM traffic — streams no faster than
# distinct blocks). The kernel structure tops out ~625 GB/s (76% of the
# 819 GB/s HBM peak) once blocks reach ~128 KB: 64 KB blocks -> 330 GB/s,
# 128 KB -> 625, 256 KB -> 627. Hence per-table block sizing below.
_TARGET_BLOCK_BYTES = 128 << 10

# int8 tables: compute the cross term as TWO int8 x int8 MXU passes with
# the query row split in-register into a hi + residual-lo int8 pair
# (VITPU_INT8_MXU=0 restores the upcast-to-bf16 dot). The per-task dot is
# M=1, so the (CHUNK, d) int8 -> bf16 astype was comparable VECTOR work to
# the dot itself — the round-4 verdict's "int8 slower than bf16 at every
# equal operating point" came from paying that upcast on every block byte
# while DMA wasn't the bottleneck. The two-pass split leaves ~14 bits of
# effective query precision on the cross term — MORE than the old bf16
# dot's 8-bit mantissa — so quantized rankings only sharpen.
_INT8_MXU = os.environ.get("VITPU_INT8_MXU", "1") == "1"


def _int8_cross(qv, x, scl):
    """Cross term qv @ x.T for an int8 residual block x, as two int8 MXU
    passes (see _INT8_MXU): qv (M, d) f32 is split per ROW into
    s1*q1 + s2*q2 with |q1| <= 127, s2 = s1/127, |q2| <= 64, leaving
    |qv - s1*q1 - s2*q2| <= s1/254 — the result matches the f32 cross
    term to ~0.4% OF THE QUERY'S SMALLEST REPRESENTABLE STEP, far inside
    the table's own +-s_c/2 row error. ``scl`` is the per-task (or
    scalar) cluster dequant scale folded into the output."""
    s1 = jnp.maximum(
        jnp.max(jnp.abs(qv), axis=-1, keepdims=True) / 127.0, 1e-12
    )  # (M, 1)
    q1 = jnp.round(qv / s1)
    s2 = s1 / 127.0
    q2 = jnp.round((qv - q1 * s1) / s2)
    dims = (((1,), (1,)), ((), ()))
    c1 = jax.lax.dot_general(
        q1.astype(jnp.int8), x, dims, preferred_element_type=jnp.int32
    )
    c2 = jax.lax.dot_general(
        q2.astype(jnp.int8), x, dims, preferred_element_type=jnp.int32
    )
    return (c1.astype(jnp.float32) * s1 + c2.astype(jnp.float32) * s2) * scl


# bf16 tables: compute the cross term as TWO bf16 MXU passes with the
# query row split into hi + lo bf16 halves (q = hi + lo to ~16 mantissa
# bits; bf16 x bf16 products are exact in the f32 accumulator). Together
# with norms stored for the QUANTIZED residual rows (build_stream_table)
# this makes the kernel distance the EXACT f32 distance to the table's
# quantized point c + r-hat — the same exact-to-quantized contract the
# int8 path has — so the error vs the true vector scales with
# 2|q-x||r - r-hat| (~0.2% of |r| per component), not with the cluster
# scale |q-c| the old single-pass cast paid. VITPU_BF16_2PASS=0 restores
# the single-pass dot.
_BF16_2PASS = os.environ.get("VITPU_BF16_2PASS", "1") == "1"


def _bf16_cross(qv, x):
    """Cross term qv @ x.T for a bf16 residual block x as a hi/lo query
    split (see _BF16_2PASS): two DEFAULT-precision MXU passes recover ~16
    bits of query mantissa at zero extra HBM traffic — the block is
    already VMEM-resident and the per-task dot is M<=Q_SHARE."""
    dims = (((1,), (1,)), ((), ()))
    q_hi = qv.astype(jnp.bfloat16)
    q_lo = (qv - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    c1 = jax.lax.dot_general(
        q_hi, x, dims, preferred_element_type=jnp.float32
    )
    c2 = jax.lax.dot_general(
        q_lo, x, dims, preferred_element_type=jnp.float32
    )
    return c1 + c2


def _cross_term(qv, x, scl_val):
    """ONE cross-term implementation for all three stream kernel bodies
    (per-query, fused-selection, shared): qv (M, d) f32 against a
    VMEM-resident (CHUNK, d) table block x in the table's dtype, f32
    result. int8 blocks fold the per-task dequant scale ``scl_val`` in."""
    int8_mode = x.dtype == jnp.int8
    if int8_mode and _INT8_MXU:
        return _int8_cross(qv, x, scl_val)
    if int8_mode:
        # int8 rows hold r/s_c; compute the cross term on the MXU in bf16
        # (the int8 HBM read is the bandwidth win) and dequant with the
        # scalar-prefetched per-cluster scale. Norms are stored for the
        # DEQUANTIZED rows, so only the cross term needs the scale here.
        return (
            jax.lax.dot_general(
                qv.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            * scl_val
        )
    if x.dtype == jnp.bfloat16 and _BF16_2PASS:
        return _bf16_cross(qv, x)
    return jax.lax.dot_general(
        qv.astype(x.dtype), x, (((1,), (1,)), ((), ())),
        precision=_dot_precision(x.dtype),
        preferred_element_type=jnp.float32,
    )


def pick_chunk(lengths_np, d: int, itemsize: int) -> int:
    """Per-table task-block row count: the smallest power-of-two block that
    reaches ~128 KB (the measured bandwidth knee — see module constants),
    UNLESS padding waste (lists are padded to whole blocks) would exceed
    ~35%; then step back down. Always >= 256 (lane-tile floor)."""
    ln = np.asarray(lengths_np, np.float64)
    total = max(ln.sum(), 1.0)
    target = max(256, _TARGET_BLOCK_BYTES // max(d * itemsize, 1))
    best = 256
    for c in (512, 1024):
        if c > target:
            break
        waste = (np.ceil(ln / c) * c).sum() / total
        if waste <= 1.35:
            best = c
    return best


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "vecs", "norms", "to_main", "sblk0", "lengths", "cent", "blk_cid",
        "scales",
    ),
    meta_fields=("m_pad", "dtype", "chunk"),
)
@dataclasses.dataclass
class StreamTable:
    """CHUNK-aligned re-pack of a PostingLayout for the block-stream kernel."""

    vecs: jax.Array  # (m_pad, d) f32/bf16/int8 RESIDUAL rows (x - centroid[c])
    norms: jax.Array  # (m_pad,) f32 |residual|^2; SENTINEL (1e30) on pad rows
    to_main: jax.Array  # (m_pad,) int32 stream row -> main layout row
    sblk0: jax.Array  # (kc,) int32 per-cluster start block
    lengths: jax.Array  # (kc,) int32 posting lengths (same as layout)
    cent: jax.Array  # (kc, d) f32 cluster centroids (residual bases)
    blk_cid: jax.Array  # (m_pad/CHUNK,) int32 owning cluster per block
    scales: jax.Array  # (kc,) f32 per-cluster int8 dequant scale (1.0 else)
    m_pad: int
    dtype: jnp.dtype
    chunk: int = CHUNK  # rows per task block (per-table, see pick_chunk)

    @property
    def bytes_per_row(self) -> int:
        return self.vecs.shape[1] * self.vecs.dtype.itemsize


def _stream_maps(layout, itemsize: int, chunk: int | None):
    """Host-side index prep shared by the device and host table builders:
    CHUNK-aligned per-cluster block bases, stream-row -> main-row map, and
    owning-cluster id per stream row."""
    starts = np.asarray(layout.offsets)[:-1].astype(np.int64)
    lengths = np.asarray(layout.lengths).astype(np.int64)
    kc = len(lengths)
    order = np.argsort(starts, kind="stable")  # layout placement order
    if chunk is None:
        chunk = pick_chunk(lengths, layout.dim, itemsize)
    CHUNK = chunk  # shadow the module default within this build

    sizes = _round_up_arr(np.maximum(lengths[order], 0), CHUNK)
    bases_in_order = np.zeros(kc, np.int64)
    if kc > 1:
        np.cumsum(sizes[:-1], out=bases_in_order[1:])
    bases = np.empty(kc, np.int64)
    bases[order] = bases_in_order
    m_pad = int(max(sizes.sum(), CHUNK))

    # Stream row -> main row; pads point at the main table's last row (a
    # zero vector with SENTINEL_NORM), though padded lanes are always masked
    # out before selection anyway.
    main_pad_row = layout.vectors.shape[0] - 1
    to_main = np.full(m_pad, main_pad_row, np.int64)
    # Cluster id per stream row, covering the cluster's whole CHUNK-rounded
    # region so every block maps to its owning cluster (pad rows keep zero
    # residuals and SENTINEL norms regardless).
    row_cid = np.zeros(m_pad, np.int64)
    for c in range(kc):
        ln = int(lengths[c])
        if ln:
            to_main[bases[c] : bases[c] + ln] = np.arange(
                starts[c], starts[c] + ln
            )
            row_cid[bases[c] : bases[c] + _round_up(ln, CHUNK)] = c
    return lengths, CHUNK, bases, m_pad, main_pad_row, to_main, row_cid


def build_stream_table(
    layout, centroids, dtype=jnp.bfloat16, chunk: int | None = None
) -> StreamTable:
    """Re-pack the main layout into CHUNK-aligned cluster blocks of RESIDUAL
    rows (device-side row gather; one-time ~O(table) cost). Residual
    encoding makes low-precision tables accurate: the error of the stored
    row scales with its distance to its centroid, not its absolute
    magnitude.

    dtype=int8 stores symmetric per-CLUSTER-scaled residuals
    (s_c = max|r|/127 over the cluster): 4x less sweep HBM than f32 — the
    larger-than-HBM serving dtype — with the norms kept as exact f32 norms
    OF THE QUANTIZED rows so in-kernel distances are consistent."""
    dtype = jnp.dtype(dtype)
    (lengths, CHUNK, bases, m_pad, main_pad_row, to_main, row_cid) = (
        _stream_maps(layout, dtype.itemsize, chunk)
    )
    kc = len(lengths)

    # Tiled device build: the eager chain would hold several table-sized
    # f32 intermediates at once (gather, residual, quantized, dequantized
    # — ~8 GB transient at n=4M), which matters on a shared chip. Row
    # tiles bound the transient peak to ~3 tile buffers; outputs stream
    # into the final arrays via lax.map/scan.
    R = min(1 << 19, _round_up(m_pad, 8))  # rows/build tile (<=256 MB f32)
    d = layout.dim
    m_t = _round_up(m_pad, R)
    real_np = to_main != main_pad_row
    idx_p = np.full(m_t, main_pad_row, np.int64)
    idx_p[:m_pad] = to_main
    cid_p = np.zeros(m_t, np.int64)
    cid_p[:m_pad] = row_cid
    real_p = np.zeros(m_t, bool)
    real_p[:m_pad] = real_np

    main_vecs = jnp.asarray(layout.vectors)
    cent = jnp.asarray(centroids, jnp.float32)
    ntile = m_t // R
    tiles = (
        jnp.asarray(idx_p, jnp.int32).reshape(ntile, R),
        jnp.asarray(cid_p, jnp.int32).reshape(ntile, R),
        jnp.asarray(real_p).reshape(ntile, R),
    )

    def residual_tile(args):
        it, ct, rt = args
        return (main_vecs[it] - cent[ct]) * rt[:, None]

    dtype = jnp.dtype(dtype)
    if dtype == jnp.int8:
        # Symmetric per-cluster quantization: scatter-max of |r| over the
        # owning cluster, then round(r / s) clipped to [-127, 127]. One-time
        # build cost; norms are the f32 norms of the DEQUANTIZED rows so
        # in-kernel |q-c|^2 - 2 s (q-c).q8 + |s q8|^2 is self-consistent.
        def p1(carry, args):
            res = residual_tile(args)
            m = jnp.max(jnp.abs(res), axis=1) * args[2]
            return carry.at[args[1]].max(m), None

        scale_c, _ = jax.lax.scan(p1, jnp.zeros(kc, jnp.float32), tiles)
        scales = jnp.maximum(scale_c / 127.0, 1e-12)

        def p2(args):
            _, ct, rt = args
            res = residual_tile(args)
            s = scales[ct][:, None]
            q8 = jnp.clip(jnp.round(res / s), -127, 127)
            deq = q8 * s
            return (
                q8.astype(jnp.int8),
                jnp.where(rt, jnp.sum(deq * deq, axis=1), 1e30),
            )

        vecs_t, norms_t = jax.lax.map(p2, tiles)
    else:
        scales = jnp.ones(kc, jnp.float32)

        # Pad rows carry SENTINEL norms so any distance computed against
        # them is >= 1e29 and can never displace a real candidate — the
        # same invariant the main layout uses; the shared kernel relies on
        # it instead of a per-lane mask. Norms are the f32 norms of the
        # STORED (dtype-cast) rows — like the int8 branch — so
        # |q-c|^2 - 2(q-c).r-hat + |r-hat|^2 is exactly |q - (c+r-hat)|^2:
        # with the two-pass bf16 cross (_bf16_cross) the kernel distance
        # is then exact-to-the-quantized-point, and its error vs the true
        # vector scales with the candidate's own distance |q-x|, not with
        # the cluster scale |q-c| the old |r|^2 encoding paid.
        def p_plain(args):
            rt = args[2]
            res = residual_tile(args)
            stored = res.astype(dtype)
            deq = stored.astype(jnp.float32)
            return (
                stored,
                jnp.where(rt, jnp.sum(deq * deq, axis=1), 1e30),
            )

        vecs_t, norms_t = jax.lax.map(p_plain, tiles)
    vecs = vecs_t.reshape(m_t, d)[:m_pad]
    norms = norms_t.reshape(m_t)[:m_pad]
    idx = jnp.asarray(to_main, jnp.int32)
    return StreamTable(
        vecs=vecs,
        norms=norms,
        to_main=idx,
        sblk0=jnp.asarray((bases // CHUNK).astype(np.int32)),
        lengths=jnp.asarray(lengths.astype(np.int32)),
        cent=cent,
        blk_cid=jnp.asarray(row_cid[::CHUNK].astype(np.int32)),
        scales=scales,
        m_pad=m_pad,
        dtype=dtype,
        chunk=CHUNK,
    )


def build_stream_table_host(
    layout, centroids, dtype=jnp.int8, chunk: int | None = None
) -> StreamTable:
    """Host-side twin of build_stream_table for layouts whose vectors live
    in host RAM (``load(..., resident='offload')``): residuals are computed
    and quantized with numpy and ONLY the compact stream table is uploaded
    — the f32 corpus never touches HBM. This is what makes the offload
    serving mode reachable for corpora whose f32 table exceeds device
    memory (the reference's bigger-than-RAM design point,
    /root/reference/src/shards.rs:188-349); the device builder would need
    the full f32 table staged first.

    Same math as the device builder (symmetric per-cluster int8 scales,
    norms of the (de)quantized rows, SENTINEL pad norms); outputs differ
    only by f32 summation order."""
    dtype = jnp.dtype(dtype)
    (lengths, CHUNK, bases, m_pad, main_pad_row, to_main, row_cid) = (
        _stream_maps(layout, dtype.itemsize, chunk)
    )
    kc = len(lengths)
    d = layout.dim
    vecs_host = np.asarray(layout.vectors)
    cent = np.asarray(centroids, np.float32)
    real = to_main != main_pad_row

    R = 1 << 19  # rows per pass (<=256 MB f32 transient)
    out_vecs = np.empty((m_pad, d), np.dtype(dtype))
    out_norms = np.full(m_pad, 1e30, np.float32)
    scales_np = np.ones(kc, np.float32)

    def _residual(lo, hi):
        res = vecs_host[to_main[lo:hi]].astype(np.float32, copy=True)
        res -= cent[row_cid[lo:hi]]
        res[~real[lo:hi]] = 0.0
        return res

    if dtype == jnp.int8:
        smax = np.zeros(kc, np.float32)
        for lo in range(0, m_pad, R):
            hi = min(lo + R, m_pad)
            m = np.abs(_residual(lo, hi)).max(axis=1) * real[lo:hi]
            np.maximum.at(smax, row_cid[lo:hi], m.astype(np.float32))
        scales_np = np.maximum(smax / 127.0, 1e-12)
        for lo in range(0, m_pad, R):
            hi = min(lo + R, m_pad)
            res = _residual(lo, hi)
            s = scales_np[row_cid[lo:hi]][:, None]
            q8 = np.clip(np.round(res / s), -127, 127)
            deq = q8 * s
            out_vecs[lo:hi] = q8.astype(np.int8)
            out_norms[lo:hi] = np.where(
                real[lo:hi], (deq * deq).sum(axis=1), 1e30
            )
    else:
        for lo in range(0, m_pad, R):
            hi = min(lo + R, m_pad)
            res = _residual(lo, hi)
            stored = res.astype(np.dtype(dtype))
            out_vecs[lo:hi] = stored
            # Norms of the STORED rows (device-builder parity): the kernel
            # distance is then exact to the quantized point c + r-hat.
            deq = stored.astype(np.float32)
            out_norms[lo:hi] = np.where(
                real[lo:hi], (deq * deq).sum(axis=1), 1e30
            )

    return StreamTable(
        vecs=jnp.asarray(out_vecs),
        norms=jnp.asarray(out_norms),
        to_main=jnp.asarray(to_main, jnp.int32),
        sblk0=jnp.asarray((bases // CHUNK).astype(np.int32)),
        lengths=jnp.asarray(lengths.astype(np.int32)),
        cent=jnp.asarray(cent),
        blk_cid=jnp.asarray(row_cid[::CHUNK].astype(np.int32)),
        scales=jnp.asarray(scales_np),
        m_pad=m_pad,
        dtype=dtype,
        chunk=CHUNK,
    )


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def expected_tasks_per_query(lengths_np, n_probe: int, chunk: int = CHUNK) -> float:
    """E[chunk tasks per query] under length-proportional probe likelihood
    (bigger cells are probed more often). Used to size the flat task budget."""
    ln = np.asarray(lengths_np, np.float64)
    n = max(ln.sum(), 1.0)
    p_probed = np.minimum(1.0, n_probe * ln / n)
    return float((p_probed * np.ceil(ln / chunk)).sum())


def per_query_slots(
    lengths_np, n_probe: int, worst_case: bool = False, chunk: int = CHUNK
) -> int:
    """t_fixed: task slots per query (multiple of FAN), quantized up to the
    {2^m, 1.5*2^m} grid so nearby nprobe sweep points share one compiled
    program. Default sizes to ~1.25x the expected task count (+slack); the
    worst case (sum of the n_probe longest lists, chunk-rounded) never drops
    a candidate."""
    from ...ops.gather import quantize_up

    ln = np.sort(np.asarray(lengths_np))[::-1]
    worst_q = int(np.ceil(ln[: min(n_probe, len(ln))] / chunk).sum())
    worst_q = max(worst_q, 1)
    if worst_case:
        t = worst_q
    else:
        exp_q = expected_tasks_per_query(lengths_np, n_probe, chunk)
        t = min(worst_q, int(1.25 * exp_q) + 2)
    return _round_up(quantize_up(t), FAN)


def _dot_precision(dtype):
    """In-kernel dots default to single bf16 MXU passes even for f32
    operands; an f32 (exact) table must request HIGHEST or its distances
    silently carry ~0.2%-of-magnitude error (measured as negative
    self-distances on real TPU; interpret mode does not reproduce it).
    bf16 tables already quantized their operands, so DEFAULT is right."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _kernel_factory(d: int, metric: str):
    # (Block row count never appears in the kernel body: all shapes come
    # from the refs, so one factory serves every chunk size.)
    #
    # DMA economics (measured on v5e, 64 KB x-blocks): the x fetch + output
    # costs ~136 ns/task; the FIRST extra small ref per task hides under it
    # for free, every further one costs ~40 ns. Hence queries and centroids
    # never enter as per-task refs: the per-(query, slot) row q - c (or q
    # for ip) is precomputed into ONE sequential (steps, FAN, d) array
    # fetched once per grid step for all FAN tasks, and the paired scalar
    # |q-c|^2 / -q.c rides the SMEM prefetch as `bias`. That leaves one
    # random small ref (norms) per task — the free one.
    def kernel(*refs):
        # refs: blk,scl,bias (SMEM prefetch), qv (1, FAN, d) sequential,
        # FAN x blocks, FAN norm blocks, FAN out blocks.
        scl_ref, bias_ref = refs[1], refs[2]
        qv_ref = refs[3]
        x_refs = refs[4 : 4 + FAN]
        n_refs = refs[4 + FAN : 4 + 2 * FAN]
        out_refs = refs[4 + 2 * FAN :]
        t = pl.program_id(0)
        for f in range(FAN):
            qv = qv_ref[0, f, :][None, :]  # (1, d) f32: q - c (l2) or q (ip)
            x = x_refs[f][:]  # (CHUNK, d) residual rows, table dtype
            bias = bias_ref[f, t]  # |q-c|^2 (l2) or -q.c (ip), exact f32
            # |q-x|^2 = |q-c|^2 - 2 (q-c).res + |res|^2 for l2 — the
            # large terms are exact f32; only the small cross term sees
            # the table dtype (_cross_term: two-pass int8 / two-pass bf16
            # / f32-HIGHEST). ip: -q.x = -q.c - q.res.
            cross = _cross_term(qv, x, scl_ref[f, t])  # (1, CHUNK)
            if metric == "l2":
                dist = bias - 2.0 * cross + n_refs[f][0]
            else:
                nrm = n_refs[f][0, 0]  # sentinel pads must stay penalized
                dist = bias - cross + jnp.where(nrm >= 1e29, nrm, 0.0)[None, :]
            out_refs[f][0, 0, 0, :] = dist[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nq", "t_sub", "metric", "chunk", "interpret")
)
def _block_stream_call(
    qvec,  # (steps, FAN, d) f32 per-(step, fan) query rows: q - c | q
    vecs,  # (m_pad, d) stream table (residual rows)
    norms,  # (m_pad,) f32
    blk,  # (FAN, nq*t_sub) int32 block id per task
    scl,  # (FAN, nq*t_sub) f32 per-task dequant scale (int8 tables)
    bias,  # (FAN, nq*t_sub) f32 per-task |q-c|^2 (l2) / -q.c (ip)
    *,
    nq: int,
    t_sub: int,
    metric: str,
    chunk: int = CHUNK,
    interpret: bool = False,
):
    """Grid step t, fan f serve query ``t % nq`` at its local slot
    ``t // nq`` of fan f's slot range — a static mapping, so only block ids
    (plus the int8 dequant scale and the bias scalar) need scalar prefetch;
    the per-task query-side rows arrive as ONE sequential ref (see
    _kernel_factory's DMA-economics note)."""
    steps = nq * t_sub
    d = qvec.shape[-1]
    kernel = _kernel_factory(d, metric)
    CHUNK = chunk  # shadow the module default for the specs below

    def qv_spec():
        return pl.BlockSpec(
            (1, FAN, d), lambda t, blk, scl, bias: (t, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def x_spec(f):
        return pl.BlockSpec(
            (CHUNK, d), lambda t, blk, scl, bias, f=f: (blk[f, t], 0),
            memory_space=pltpu.VMEM,
        )

    def n_spec(f):
        # Norms viewed (m_blocks, 1, CHUNK): a (1, 1, CHUNK) block satisfies
        # tiling, and XLA's T(1024) 1-D layout never enters the kernel.
        return pl.BlockSpec(
            (1, 1, CHUNK), lambda t, blk, scl, bias, f=f: (blk[f, t], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def o_spec(f):
        return pl.BlockSpec(
            (1, 1, 1, CHUNK),
            lambda t, blk, scl, bias: (t % nq, t // nq, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[qv_spec()]
        + [x_spec(f) for f in range(FAN)]
        + [n_spec(f) for f in range(FAN)],
        out_specs=[o_spec(f) for f in range(FAN)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, t_sub, 1, CHUNK), jnp.float32)
            for _ in range(FAN)
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * FAN * steps * CHUNK * d,
            bytes_accessed=FAN * steps * CHUNK * d * vecs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        blk, scl, bias,
        qvec,
        *([vecs] * FAN),
        *([norms.reshape(-1, 1, CHUNK)] * FAN),
    )
    return outs


def pick_stream_groups(chunk: int) -> int:
    """Accumulator group count G for the fused-selection kernel: target
    ~1024 (group, lane) accumulator positions (2048-column output plane —
    the cheap end of the XLA selection curve, and the same expected
    top-2-per-lane tail loss as flat_sweep's C=8 plane: ~0.5% at k=100,
    exactly 0 at k=1 since a lane's min always survives). G must divide
    FAN (fans are routed to groups round-robin)."""
    g = max(1, min(8, 1024 // chunk))
    while FAN % g:  # pragma: no cover - FAN=16 makes 1/2/4/8 all valid
        g -= 1
    return g


def _fused_kernel_factory(d: int, metric: str, t_sub: int, G: int, chunk: int):
    # Fused-selection variant of _kernel_factory: instead of materializing
    # every task's (1, CHUNK) distance row to HBM (t_fixed*CHUNK columns per
    # query for the epilogue to select over — ~11 ms/kilobatch once the
    # plane is materialized, nearly independent of width), each query's
    # output block is a per-(group, lane) (best, second) accumulator plane
    # that stays VMEM-resident across the query's t_sub grid steps (the
    # grid is QUERY-MAJOR here — step t serves query t // t_sub — so the
    # block index map revisits the same block consecutively and Mosaic
    # flushes it to HBM once per query). Fan f feeds group f % G; lanes
    # beyond a list's end are inf-masked in-kernel from the prefetched
    # nval array (unused slots have nval=0). A parallel int32 plane records
    # the winning global slot id so the epilogue can map (group, lane) back
    # to a stream row. Distance math is identical to _kernel_factory.
    def kernel(*refs):
        scl_ref, bias_ref, nval_ref = refs[1], refs[2], refs[3]
        qv_ref = refs[4]
        x_refs = refs[5 : 5 + FAN]
        n_refs = refs[5 + FAN : 5 + 2 * FAN]
        out_d, out_s = refs[5 + 2 * FAN], refs[5 + 2 * FAN + 1]
        t = pl.program_id(0)
        u = t % t_sub  # local slot within the query (query-major grid)

        @pl.when(u == 0)
        def _init():
            # Output refs are (1, 1, 2*G*chunk): Mosaic's tiling rule wants
            # the block's last-two dims divisible by (8, 128) or equal to
            # the array's — a literal (1, width) block over an (nq, width)
            # array satisfies neither, so the plane carries a unit axis.
            out_d[...] = jnp.full((1, 1, 2 * G * chunk), jnp.inf, jnp.float32)
            out_s[...] = jnp.full((1, 1, 2 * G * chunk), -1, jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        for f in range(FAN):
            qv = qv_ref[0, f, :][None, :]  # (1, d) f32: q - c (l2) or q (ip)
            x = x_refs[f][:]  # (CHUNK, d) residual rows, table dtype
            bias = bias_ref[f, t]
            cross = _cross_term(qv, x, scl_ref[f, t])  # (1, CHUNK)
            if metric == "l2":
                dist = bias - 2.0 * cross + n_refs[f][0]
            else:
                nrm = n_refs[f][0, 0]
                dist = bias - cross + jnp.where(nrm >= 1e29, nrm, 0.0)[None, :]
            dist = jnp.where(lane < nval_ref[f, t], dist, jnp.inf)
            slot = jnp.full((1, chunk), f * t_sub, jnp.int32) + u

            g = f % G
            ob = slice(g * chunk, (g + 1) * chunk)  # best plane, group g
            os_ = slice((G + g) * chunk, (G + g + 1) * chunk)  # second
            b, bi = out_d[0, :, ob], out_s[0, :, ob]
            s2, si = out_d[0, :, os_], out_s[0, :, os_]
            better = dist < b
            disp = jnp.where(better, b, dist)  # displaced candidate
            disp_i = jnp.where(better, bi, slot)
            out_d[0, :, ob] = jnp.where(better, dist, b)
            out_s[0, :, ob] = jnp.where(better, slot, bi)
            sec = disp < s2
            out_d[0, :, os_] = jnp.where(sec, disp, s2)
            out_s[0, :, os_] = jnp.where(sec, disp_i, si)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nq", "t_sub", "metric", "chunk", "groups", "interpret"),
)
def _block_stream_fused_call(
    qvec,  # (steps, FAN, d) f32 per-(step, fan) query rows: q - c | q
    vecs,  # (m_pad, d) stream table (residual rows)
    norms,  # (m_pad,) f32
    blk,  # (FAN, nq*t_sub) int32 block id per task (query-major order)
    scl,  # (FAN, nq*t_sub) f32 per-task dequant scale (int8 tables)
    bias,  # (FAN, nq*t_sub) f32 per-task |q-c|^2 (l2) / -q.c (ip)
    nval,  # (FAN, nq*t_sub) int32 valid lanes per task (0 = unused slot)
    *,
    nq: int,
    t_sub: int,
    metric: str,
    chunk: int = CHUNK,
    groups: int = 4,
    interpret: bool = False,
):
    """Fused-selection twin of _block_stream_call: grid step t serves query
    ``t // t_sub`` at local slot ``t % t_sub`` (query-major, so the
    accumulator output block is revisited consecutively). Returns
    (dist_plane (nq, 2*G*chunk) f32, slot_plane (nq, 2*G*chunk) i32)."""
    steps = nq * t_sub
    d = qvec.shape[-1]
    G = groups
    kernel = _fused_kernel_factory(d, metric, t_sub, G, chunk)
    CHUNK = chunk  # shadow the module default for the specs below

    def qv_spec():
        return pl.BlockSpec(
            (1, FAN, d), lambda t, blk, scl, bias, nval: (t, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def x_spec(f):
        return pl.BlockSpec(
            (CHUNK, d), lambda t, blk, scl, bias, nval, f=f: (blk[f, t], 0),
            memory_space=pltpu.VMEM,
        )

    def n_spec(f):
        return pl.BlockSpec(
            (1, 1, CHUNK),
            lambda t, blk, scl, bias, nval, f=f: (blk[f, t], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def o_spec():
        return pl.BlockSpec(
            (1, 1, 2 * G * CHUNK),
            lambda t, blk, scl, bias, nval: (t // t_sub, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(steps,),
        in_specs=[qv_spec()]
        + [x_spec(f) for f in range(FAN)]
        + [n_spec(f) for f in range(FAN)],
        out_specs=[o_spec(), o_spec()],
    )
    dist_plane, slot_plane = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1, 2 * G * CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1, 2 * G * CHUNK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * FAN * steps * CHUNK * d,
            bytes_accessed=FAN * steps * CHUNK * d * vecs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        blk, scl, bias, nval,
        qvec,
        *([vecs] * FAN),
        *([norms.reshape(-1, 1, CHUNK)] * FAN),
    )
    return dist_plane[:, 0], slot_plane[:, 0]


def build_task_grid(queries, table: StreamTable, probe, t_fixed: int, metric: str):
    """Per-query task grid for the stream kernels: slot s of a query is
    chunk c of its probe j, nearest probes first. Unrolled over p with
    (nq, t_fixed) lanes (searchsorted forms serialize on TPU). Returns
    (blk2d, cid2d, nval2d, qc_all, bias2d): block/cluster/valid-lane grids
    plus the precomputed query-side rows (q - c for l2, q for ip) and the
    lane-constant bias (|q-c|^2 / -q.c) — so the kernel needs no per-task
    query/centroid fetches (the gather source is the small centroid table;
    ~8 KB of sequential qvec per grid step). Shared by both stream kernels
    and the overhead-decomposition bench (scripts/decompose_stream.py)."""
    nq, d = queries.shape
    p = probe.shape[1]
    CHUNK = table.chunk

    sblk0 = table.sblk0[probe]  # (nq, p) start blocks
    lens = table.lengths[probe]
    nchunks = -(-lens // CHUNK)

    cum = jnp.cumsum(nchunks, axis=1)
    cum_prev = cum - nchunks
    s = jnp.arange(t_fixed, dtype=jnp.int32)[None, :]
    blk2d = jnp.zeros((nq, t_fixed), jnp.int32)
    cid2d = jnp.zeros((nq, t_fixed), jnp.int32)
    nval2d = jnp.zeros((nq, t_fixed), jnp.int32)
    for j in range(p):
        inseg = (s >= cum_prev[:, j : j + 1]) & (s < cum[:, j : j + 1])
        c = s - cum_prev[:, j : j + 1]
        blk2d = jnp.where(inseg, sblk0[:, j : j + 1] + c, blk2d)
        cid2d = jnp.where(inseg, probe[:, j : j + 1], cid2d)
        nval2d = jnp.where(
            inseg, jnp.minimum(CHUNK, lens[:, j : j + 1] - c * CHUNK), nval2d
        )

    if metric == "l2":
        qc_all = queries[:, None, :] - table.cent[cid2d]  # (nq, t_fixed, d)
        bias2d = jnp.sum(qc_all * qc_all, axis=-1)
    else:
        qc_all = jnp.broadcast_to(
            queries[:, None, :], (nq, t_fixed, d)
        )
        bias2d = -jnp.sum(queries[:, None, :] * table.cent[cid2d], axis=-1)
    return blk2d, cid2d, nval2d, qc_all, bias2d


def block_stream_search(
    queries,  # (nq, d) f32 (pre-normalized for cosine)
    table: StreamTable,
    probe,  # (nq, p) int32 — probed cluster ids, nearest first
    k: int,
    *,
    t_fixed: int,
    metric: str = "l2",
    approx: bool = True,
    fused: bool | None = None,
    interpret: bool = False,
):
    """-> (D (nq, k) f32, main layout rows (nq, k) int32, inf/-1 padded).
    Jit-traceable (call under jit). Each query gets t_fixed CHUNK-row task
    slots, nearest probed lists first; chunks beyond t_fixed are dropped
    (see per_query_slots).

    ``fused`` selects the fused-selection kernel (in-kernel per-lane top-2
    accumulator planes; the epilogue selects over a fixed 2*G*CHUNK-column
    plane instead of the materialized t_fixed*CHUNK one — the same
    materialized-plane-selection economics that drove flat_sweep). Default
    (None): engage when the materialized plane would be wider than twice
    the accumulator plane and k fits in half of it; VITPU_FUSED_STREAM=0/1
    force-overrides. Exactly lossless for the per-lane minimum (R@1); the
    top-2-per-lane tail loss at k=100 over >=1024 lanes is ~0.5% before
    the exact re-rank (flat_sweep math, see pick_stream_groups)."""
    nq, d = queries.shape
    t_sub = t_fixed // FAN  # slots per fan (t_fixed % FAN == 0)
    CHUNK = table.chunk  # per-table block rows (see pick_chunk)

    blk2d, cid2d, nval2d, qc_all, bias2d = build_task_grid(
        queries, table, probe, t_fixed, metric
    )

    # Static packing: fan f owns slots [f*t_sub, (f+1)*t_sub); its step t
    # serves (query t % nq, local slot t // nq). blk/scale/bias arrays are
    # pure transposes — no scatter.
    def fan_flat(a2d):
        return jnp.stack(
            [
                a2d[:, f * t_sub : (f + 1) * t_sub].T.reshape(-1)
                for f in range(FAN)
            ]
        )

    def fan_steps(a3d):  # (nq, t_fixed, d) -> (steps, FAN, d)
        return jnp.stack(
            [
                a3d[:, f * t_sub : (f + 1) * t_sub]
                .transpose(1, 0, 2)
                .reshape(-1, a3d.shape[-1])
                for f in range(FAN)
            ],
            axis=1,
        )

    G = pick_stream_groups(CHUNK)
    if fused is None:
        # Never auto-engage for exact selection (approx=False is the
        # stream_exact escape hatch; top-2-per-lane is approximate for
        # k > 1). VITPU_FUSED_STREAM=0/1 force-overrides within that.
        env = os.environ.get("VITPU_FUSED_STREAM")
        if env is not None:
            fused = approx and env != "0"
        else:
            fused = (
                approx
                and t_fixed * CHUNK >= FUSED_STREAM_MIN_ROWS
                and k <= G * CHUNK
            )
    if fused and k > 2 * G * CHUNK:
        fused = False  # selection cannot return more than the plane holds

    if fused:
        # Query-major packing: fan f's step t serves (query t // t_sub,
        # local slot t % t_sub). Same global slot numbering as fan_flat
        # (fan f owns slots [f*t_sub, (f+1)*t_sub)) — only the step order
        # differs, so blk2d indexing in the epilogue is unchanged.
        def fan_flat_q(a2d):
            return jnp.stack(
                [
                    a2d[:, f * t_sub : (f + 1) * t_sub].reshape(-1)
                    for f in range(FAN)
                ]
            )

        def fan_steps_q(a3d):  # (nq, t_fixed, d) -> (steps, FAN, d)
            return jnp.stack(
                [
                    a3d[:, f * t_sub : (f + 1) * t_sub].reshape(
                        -1, a3d.shape[-1]
                    )
                    for f in range(FAN)
                ],
                axis=1,
            )

        dist_plane, slot_plane = _block_stream_fused_call(
            fan_steps_q(qc_all),
            table.vecs,
            table.norms,
            fan_flat_q(blk2d),
            fan_flat_q(table.scales[cid2d]),
            fan_flat_q(bias2d),
            fan_flat_q(nval2d),
            nq=nq,
            t_sub=t_sub,
            metric=metric,
            chunk=CHUNK,
            groups=G,
            interpret=interpret,
        )
        if approx and dist_plane.shape[1] > max(512, 2 * k):
            dvals, ci = jax.lax.approx_min_k(
                dist_plane, k, recall_target=0.99
            )
        else:
            from ..topk import topk_smallest

            dvals, ci = topk_smallest(dist_plane, k)
        ci0 = jnp.maximum(ci, 0)
        s_sel = jnp.take_along_axis(slot_plane, ci0, axis=1)
        w_sel = ci0 % CHUNK  # lane within the chunk block
        blk_sel = jnp.take_along_axis(blk2d, jnp.maximum(s_sel, 0), axis=1)
        srow = blk_sel * CHUNK + w_sel
        main_rows = table.to_main[srow]
        real = (ci >= 0) & (s_sel >= 0) & jnp.isfinite(dvals) & (dvals < 1e29)
        main_rows = jnp.where(real, main_rows, -1)
        dvals = jnp.where(real, dvals, jnp.inf)
        return dvals, main_rows

    outs = _block_stream_call(
        fan_steps(qc_all),
        table.vecs,
        table.norms,
        fan_flat(blk2d),
        fan_flat(table.scales[cid2d]),
        fan_flat(bias2d),
        nq=nq,
        t_sub=t_sub,
        metric=metric,
        chunk=CHUNK,
        interpret=interpret,
    )

    # Mask lanes beyond list ends / unused slots, then select. Garbage in
    # masked lanes is never read unmasked.
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, None, :]
    parts = []
    for f in range(FAN):
        dist_f = outs[f][:, :, 0, :]  # (nq, t_sub, CHUNK)
        nval_f = nval2d[:, f * t_sub : (f + 1) * t_sub]
        ok = lane < nval_f[:, :, None]
        parts.append(jnp.where(ok, dist_f, jnp.inf).reshape(nq, t_sub * CHUNK))
    dist_cat = jnp.concatenate(parts, axis=1)  # (nq, t_fixed*CHUNK)

    if approx and dist_cat.shape[1] > max(512, 2 * k):
        # Hardware PartialReduce selection: exact lax.top_k measured ~2-3 ms
        # per kilobatch even at width 2048.
        dvals, ci = jax.lax.approx_min_k(dist_cat, k, recall_target=0.99)
    else:
        from ..topk import topk_smallest

        dvals, ci = topk_smallest(dist_cat, k)

    # Lane index -> (fan, slot, lane) -> stream row -> main layout row.
    ci0 = jnp.maximum(ci, 0)
    f_sel = ci0 // (t_sub * CHUNK)
    rem = ci0 % (t_sub * CHUNK)
    u_sel = rem // CHUNK
    w_sel = rem % CHUNK
    s_sel = f_sel * t_sub + u_sel  # global slot
    blk_sel = jnp.take_along_axis(blk2d, s_sel, axis=1)
    srow = blk_sel * CHUNK + w_sel
    main_rows = table.to_main[srow]
    real = (ci >= 0) & jnp.isfinite(dvals)
    main_rows = jnp.where(real, main_rows, -1)
    dvals = jnp.where(real, dvals, jnp.inf)
    return dvals, main_rows


# ---------------------------------------------------------------------------
# Shared (block-major) variant: one block fetch serves many queries
# ---------------------------------------------------------------------------
#
# The per-query kernel above fetches every probed block once PER QUERY; in a
# large batch many queries probe the same cluster, so the same HBM bytes
# stream repeatedly (at n=100k, nq=1024, nprobe=8 each cluster is probed by
# ~6.5 queries on average). The shared variant inverts the task list: one
# task = one (block, <=Q_SHARE queries) group, built by sorting the
# (query, chunk) pairs by block id — the block is fetched once and scored
# against each grouped query. The MXU pads any M<128 matmul to a full tile,
# so grouping costs no extra compute time; effective bandwidth scales with
# the sharing factor.
#
# Task-major output: each grid step writes its own (FAN_S*Q_SHARE, CHUNK)
# distance block at a static offset (double-buffered stream to HBM), and
# the caller gathers rows back to per-query order before selection. This
# removes ALL dynamic sublane ops from the kernel — a prior VMEM-resident
# plane design wrote each pair's row at a dynamic offset, costing Q_SHARE
# x ~160 ns per task, the dominant per-task cost (and its plane capped
# q_tile at 8 MB of VMEM). The extra traffic is CHUNK*4 B of plane write
# + 2x CHUNK*4 B gather per pair (~12% of a bf16 d=128 sweep). Query-side
# rows arrive pre-subtracted in a sequential per-step ref; the int8 scale
# rides the SMEM prefetch; the lane-constant |q-c|^2 / -q.c bias is added
# outside, after the gather-back.

Q_SHARE = 8  # query slots per task
FAN_S = 8  # blocks (tasks) per grid step — amortizes Mosaic's per-step cost
_TASK_ALIGN = Q_SHARE * FAN_S


def shared_task_cap(
    lengths_np, n_probe: int, nq_tile: int, t_fixed: int,
    worst_case: bool = False, chunk: int = CHUNK,
) -> int:
    """Static task budget for the shared kernel. The worst case
    sum_b ceil(c_b/Q) <= npairs//Q + min(npairs, nblocks) never drops a
    (query, chunk) pair; the default sizes to ~1.15x the expected unique-
    block count + full-task term."""
    ln = np.asarray(lengths_np, np.float64)
    npairs = nq_tile * t_fixed
    nblocks = int(np.ceil(np.maximum(ln, 1) / chunk).sum())
    # A task holds >= 1 pair, so npairs is itself a hard task bound (the
    # sum bound below can exceed it when nblocks is large vs a small tile).
    worst = min(npairs, npairs // Q_SHARE + min(npairs, nblocks) + 1)
    if worst_case:
        return _round_up(worst, _TASK_ALIGN)
    n = max(ln.sum(), 1.0)
    p_probed = np.minimum(1.0, n_probe * ln / n)
    # P(cluster probed by >= 1 query of the tile) x its chunk count.
    e_blocks = float(
        ((1.0 - (1.0 - p_probed) ** nq_tile) * np.ceil(ln / chunk)).sum()
    )
    exp = int(1.15 * (e_blocks + npairs / Q_SHARE)) + 8
    from ...ops.gather import quantize_up

    return _round_up(min(worst, quantize_up(exp)), _TASK_ALIGN)


def _shared_kernel_factory(d: int, metric: str):
    # (Chunk-free body: all shapes come from the refs.) Same DMA economics
    # as the per-query kernel: the per-pair query-side rows q-c (or q)
    # arrive pre-subtracted in ONE sequential ref per grid step, with the
    # int8 dequant scale riding the SMEM prefetch. A task's Q_SHARE pairs
    # are scored by ONE (Q_SHARE, d) x (d, CHUNK) matmul and stored with
    # ONE static sublane-slice write into the step's output block — no
    # dynamic sublane ops at all (a prior VMEM-plane design paid Q_SHARE
    # dynamic row writes x ~160 ns per task, the dominant per-task cost).
    # The per-pair |q-c|^2 / -q.c bias is added OUTSIDE the kernel, after
    # the pair gather-back (it is lane-constant, so it commutes with
    # selection-input assembly).
    def kernel(*refs):
        # refs: blk,scl (SMEM prefetch), qcs (1, FAN_S*Q_SHARE, d)
        # sequential, FAN_S x blocks, FAN_S norm blocks,
        # out (1, FAN_S*Q_SHARE, CHUNK) per-step block.
        _blk_ref, scl_ref = refs[:2]
        qcs_ref = refs[2]
        x_refs = refs[3 : 3 + FAN_S]
        n_refs = refs[3 + FAN_S : 3 + 2 * FAN_S]
        out_ref = refs[3 + 2 * FAN_S]
        t = pl.program_id(0)

        for f in range(FAN_S):
            x = x_refs[f][:]  # (CHUNK, d) residual rows, table dtype
            nrm = n_refs[f][0, 0]  # (CHUNK,) f32; SENTINEL on pad rows
            qc8 = qcs_ref[0, f * Q_SHARE : (f + 1) * Q_SHARE, :]
            # l2: |q-x|^2 = [|q-c|^2 outside] - 2 (q-c).res + |res|^2
            # (large terms exact f32); ip: -q.x = [-q.c outside] - q.res.
            # Per-ROW splits (each of the Q_SHARE rows gets its own
            # hi/lo or int8 scales) — same shared _cross_term.
            cross = _cross_term(qc8, x, scl_ref[f, t])  # (Q_SHARE, CHUNK)
            if metric == "l2":
                dist = nrm[None, :] - 2.0 * cross
            else:  # sentinel pads penalized
                dist = jnp.where(nrm >= 1e29, nrm, 0.0)[None, :] - cross
            out_ref[0, f * Q_SHARE : (f + 1) * Q_SHARE, :] = dist

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_cap", "metric", "chunk", "interpret"),
)
def _block_stream_shared_call(
    qcs,  # (steps, FAN_S*Q_SHARE, d) f32 pre-subtracted q-c (q for ip)
    vecs,  # (m_pad, d) stream table
    norms,  # (m_pad,) f32
    blk,  # (FAN_S, steps) int32 — block id per task
    scl,  # (FAN_S, steps) f32 — int8 dequant scale per task
    *,
    t_cap: int,
    metric: str,
    chunk: int = CHUNK,
    interpret: bool = False,
):
    d = qcs.shape[-1]
    steps = t_cap // FAN_S
    kernel = _shared_kernel_factory(d, metric)
    CHUNK = chunk  # shadow the module default for the specs below

    def x_spec(f):
        return pl.BlockSpec(
            (CHUNK, d), lambda t, blk, scl, f=f: (blk[f, t], 0),
            memory_space=pltpu.VMEM,
        )

    def n_spec(f):
        return pl.BlockSpec(
            (1, 1, CHUNK),
            lambda t, blk, scl, f=f: (blk[f, t], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, FAN_S * Q_SHARE, d), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [x_spec(f) for f in range(FAN_S)]
        + [n_spec(f) for f in range(FAN_S)],
        # Task-major output: step t owns rows [t*FAN_S*Q_SHARE, ...) — a
        # small double-buffered block streamed to HBM (+CHUNK*4 B/row of
        # write traffic, ~12% of a bf16 d=128 sweep), not a VMEM-resident
        # plane. The caller gathers rows back to per-query order.
        out_specs=pl.BlockSpec(
            (1, FAN_S * Q_SHARE, CHUNK), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    plane = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (steps, FAN_S * Q_SHARE, CHUNK), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * t_cap * Q_SHARE * CHUNK * d,
            bytes_accessed=t_cap * CHUNK * d * vecs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        blk, scl,
        qcs,
        *([vecs] * FAN_S),
        *([norms.reshape(-1, 1, CHUNK)] * FAN_S),
    )
    return plane


def block_stream_search_shared(
    queries,  # (nq, d) f32 (pre-normalized for cosine)
    table: StreamTable,
    probe,  # (nq, p) int32 — probed cluster ids, nearest first
    k: int,
    *,
    t_fixed: int,
    t_cap: int,
    metric: str = "l2",
    approx: bool = True,
    interpret: bool = False,
):
    """Shared-block variant of ``block_stream_search``: same contract
    (-> (D, main rows), inf/-1 padded), but each probed block is fetched
    once per TILE instead of once per query. Tasks beyond ``t_cap`` are
    dropped (their slots stay +inf — graceful recall degradation; size
    t_cap with worst_case=True to forbid drops)."""
    nq, d = queries.shape
    p = probe.shape[1]
    CHUNK = table.chunk  # per-table block rows (see pick_chunk)

    sblk0 = table.sblk0[probe]  # (nq, p) start blocks
    lens = table.lengths[probe]
    nchunks = -(-lens // CHUNK)

    # Per-query slot grid (nq, t_fixed), nearest probes first (identical to
    # the per-query kernel's packing).
    cum = jnp.cumsum(nchunks, axis=1)
    cum_prev = cum - nchunks
    s = jnp.arange(t_fixed, dtype=jnp.int32)[None, :]
    blk2d = jnp.zeros((nq, t_fixed), jnp.int32)
    for j in range(p):
        inseg = (s >= cum_prev[:, j : j + 1]) & (s < cum[:, j : j + 1])
        blk2d = jnp.where(inseg, sblk0[:, j : j + 1] + (s - cum_prev[:, j : j + 1]),
                          blk2d)
    valid2d = s < cum[:, -1:]  # slot carries a real (query, chunk) pair

    # Invert to block-major tasks: sort pairs by block id (invalid pairs get
    # a sentinel key and sink to the end), then cut each block's run into
    # tasks of Q_SHARE pairs. All gathers/sorts/cumsums — no scatters (XLA
    # scatters measured ~6 ms/kilobatch in a previous packing design).
    npairs = nq * t_fixed
    nblocks = table.m_pad // CHUNK
    qrow_f = jnp.arange(npairs, dtype=jnp.int32)  # query*t_fixed+slot
    blk_f = jnp.where(valid2d, blk2d, nblocks).reshape(-1)
    slot_f = qrow_f % t_fixed  # probe-rank proxy (slots fill nearest-first)

    # Two-pass ordering so that if tasks overflow t_cap, the DROPPED tasks
    # are those whose best pair has the worst probe rank — matching the
    # per-query kernel's farthest-probes-first truncation guarantee (a plain
    # block-id sort would drop arbitrary tasks, possibly a query's own
    # nearest cell). Pass 1 groups pairs by (block, probe rank): each
    # block's segment then leads with the block's best rank. Pass 2 reorders
    # whole blocks by that rank (invalid pairs keep the sentinel block id
    # and sink last).
    # Lexicographic orders via chained stable sorts (int32-safe at any
    # table scale; composite integer keys could overflow).
    iota = jnp.arange(npairs, dtype=jnp.int32)
    ord_s = jnp.argsort(slot_f, stable=True)
    ord1 = ord_s[jnp.argsort(blk_f[ord_s], stable=True)]  # (blk, slot) order
    ks1 = blk_f[ord1]
    is_start1 = jnp.concatenate([jnp.ones(1, bool), ks1[1:] != ks1[:-1]])
    seg_start1 = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start1, iota, 0)
    )
    prio1 = slot_f[ord1][seg_start1]  # block's best probe rank, per pair
    # (prio, blk) order: pass 1 is already blk-minor, so one stable sort by
    # prio suffices; same-block pairs stay contiguous (equal prio).
    ord2 = jnp.argsort(prio1, stable=True)
    ordv = ord1[ord2]
    ks = ks1[ord2]
    qrow_s = qrow_f[ordv]

    is_start = jnp.concatenate(
        [jnp.ones(1, bool), ks[1:] != ks[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0)
    )
    rank = iota - seg_start
    newtask = ((rank % Q_SHARE) == 0) & (ks < nblocks)
    # Task start positions, in block order (stable 0/1 sort compacts them).
    # t_cap may exceed npairs only through alignment rounding; pad with
    # position 0 — valid_task masks the padding.
    pos_all = jnp.argsort(jnp.logical_not(newtask), stable=True)
    if t_cap <= npairs:
        pos_t = pos_all[:t_cap]
    else:
        pos_t = jnp.pad(pos_all, (0, t_cap - npairs))
    n_tasks = jnp.sum(newtask.astype(jnp.int32))
    valid_task = jnp.arange(t_cap, dtype=jnp.int32) < n_tasks
    blk_t = jnp.where(valid_task, ks[pos_t], 0)
    cid_t = table.blk_cid[blk_t]

    pos = pos_t[None, :] + jnp.arange(Q_SHARE, dtype=jnp.int32)[:, None]
    pos_c = jnp.minimum(pos, npairs - 1)
    in_task = valid_task[None, :] & (pos < npairs) & (ks[pos_c] == blk_t[None, :])
    trash = nq * t_fixed  # unused task slots gather the zero query row
    qrow_t = jnp.where(in_task, qrow_s[pos_c], trash)

    # Query-side rows per (task, pair), pre-subtracted so the kernel needs
    # no centroid blocks or dynamic query reads (trash pairs hit the zero
    # query row; their finite garbage lands in plane rows no pair gathers).
    qi_t = qrow_t // t_fixed  # (Q_SHARE, t_cap); trash -> row nq
    qall = jnp.pad(queries, ((0, 1), (0, 0)))  # zero row at index nq
    qsel = qall[qi_t]  # (Q_SHARE, t_cap, d)
    cent_t = table.cent[cid_t]  # (t_cap, d) task-block centroids
    qc = qsel - cent_t[None, :, :] if metric == "l2" else qsel
    scl_t = table.scales[cid_t]  # (t_cap,)

    # Fan-major split: fan f owns tasks [f*steps, (f+1)*steps).
    steps = t_cap // FAN_S
    blk_fan = blk_t.reshape(FAN_S, steps)
    scl_fan = scl_t.reshape(FAN_S, steps)
    qcs = (
        qc.reshape(Q_SHARE, FAN_S, steps, d)
        .transpose(2, 1, 0, 3)
        .reshape(steps, FAN_S * Q_SHARE, d)
    )

    plane = _block_stream_shared_call(
        qcs, table.vecs, table.norms,
        blk_fan, scl_fan,
        t_cap=t_cap, metric=metric, chunk=CHUNK, interpret=interpret,
    )  # (steps, FAN_S*Q_SHARE, CHUNK), task-major rows

    # Gather each (query, slot) pair's distance row back from the
    # task-major plane. Sorted position i sits in task tid = (#task starts
    # <= i) - 1 at in-task rank (rank % Q_SHARE); task tid is fan-major
    # task (f = tid // steps, step tid % steps), so its plane row is
    # step*FAN_S*Q_SHARE + f*Q_SHARE + s. Pairs of dropped tasks
    # (tid >= t_cap) and invalid pairs read as +inf via the written mask —
    # the same graceful-degradation contract as the old VMEM plane.
    tid_pos = jnp.cumsum(newtask.astype(jnp.int32)) - 1
    s_in = rank % Q_SHARE
    written_s = (ks < nblocks) & (tid_pos >= 0) & (tid_pos < t_cap)
    tidc = jnp.clip(tid_pos, 0, t_cap - 1)
    row_s = (
        (tidc % steps) * (FAN_S * Q_SHARE) + (tidc // steps) * Q_SHARE + s_in
    )
    inv = jnp.argsort(ordv, stable=True)  # pair id -> sorted position
    dist_p = plane.reshape(-1, CHUNK)[row_s[inv]]  # (npairs, CHUNK)
    dist_p = jnp.where(written_s[inv][:, None], dist_p, jnp.inf)

    # Lane-constant bias (|q-c|^2 for l2, -q.c for ip), added after the
    # gather-back: per (query, slot) from the slot's block cluster.
    cid2d = table.blk_cid[jnp.where(valid2d, blk2d, 0)]
    if metric == "l2":
        diff = queries[:, None, :] - table.cent[cid2d]
        bias2d = jnp.sum(diff * diff, axis=-1)  # (nq, t_fixed)
    else:
        bias2d = -jnp.sum(queries[:, None, :] * table.cent[cid2d], axis=-1)
    dist_cat = (
        dist_p.reshape(nq, t_fixed, CHUNK) + bias2d[:, :, None]
    ).reshape(nq, t_fixed * CHUNK)

    if approx and dist_cat.shape[1] > max(512, 2 * k):
        dvals, ci = jax.lax.approx_min_k(dist_cat, k, recall_target=0.99)
    else:
        from ..topk import topk_smallest

        dvals, ci = topk_smallest(dist_cat, k)

    # Lane index -> (slot, lane) -> stream row -> main layout row.
    ci0 = jnp.maximum(ci, 0)
    s_sel = ci0 // CHUNK
    w_sel = ci0 % CHUNK
    blk_sel = jnp.take_along_axis(blk2d, s_sel, axis=1)
    srow = blk_sel * CHUNK + w_sel
    main_rows = table.to_main[srow]
    real = (ci >= 0) & jnp.isfinite(dvals) & (dvals < 1e29)
    main_rows = jnp.where(real, main_rows, -1)
    dvals = jnp.where(real, dvals, jnp.inf)
    return dvals, main_rows
