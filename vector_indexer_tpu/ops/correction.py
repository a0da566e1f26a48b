"""Error-correction ("refine") table for offloaded serving: a second int8
residual layer over the stream table's quantization error.

Offload mode (IvfIndex.offload_main_table / offload_from_host) frees the
f32 main table and serves from a compact quantized stream table. Exact
distances then need the HOST mirror (rerank='host' — a gather + GEMM that
is compute-bound on small hosts; VERDICT round-4 task 7 measured it at
0.56-0.67x of device-ranked throughput on this single-core container).

rerank='device' closes that gap ON DEVICE: store q2 = round(err / s2)
where err = r - r_hat is the stream table's own quantization error and
s2 = max_cluster|err| / 127. The reconstruction

    x_hat = c + r_hat + s2 * q2

carries ~14 effective bits per component for an int8 stream table
(s2 ~ s1/127), so re-ranking the widened shortlist against x_hat returns
distances ~2 orders closer to exact f32 than the int8 kernel ranking
(and ~1 order better than the bf16 stream default) at device speed —
no host GEMM, no host mirror required at query time.

HBM cost: d + 4 bytes/row on top of the stream table (q2 + |x_hat|^2);
an int8 offload at d=128 goes from ~1.03x to ~2.03x int8-table bytes —
still ~2x smaller than the f32 table it replaced.

Reference parity: the reference's only offload analog re-ranks exactly
from disk-resident rows (/root/reference/src/shards.rs:188-349); this is
the TPU-native middle point between its exact-from-slow-tier re-rank and
our quantized device ranking.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.block_stream import _stream_maps


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("q2", "scales2", "norms_abs", "inv"),
    meta_fields=("m_pad",),
)
@dataclasses.dataclass
class CorrectionTable:
    """Second-layer int8 correction aligned with a StreamTable's rows."""

    q2: jax.Array  # (m_pad, d) int8 quantized quantization error
    scales2: jax.Array  # (kc,) f32 per-cluster dequant scale for q2
    norms_abs: jax.Array  # (m_pad,) f32 |x_hat|^2 ABSOLUTE norms; 1e30 pads
    inv: jax.Array  # (n_pad_main,) int32 main layout row -> stream row
    m_pad: int

    @property
    def hbm_bytes(self) -> int:
        return (
            self.q2.size * self.q2.dtype.itemsize
            + self.norms_abs.size * 4
            + self.inv.size * 4
            + self.scales2.size * 4
        )


def _inv_map(to_main: np.ndarray, main_pad_row: int, n_pad: int) -> np.ndarray:
    """Main layout row -> stream row. Rows outside to_main's image (gaps,
    the pad row) map to stream row 0 — they can never be selected (their
    kernel distances are sentinel-masked), the 0 just keeps gathers in
    bounds."""
    inv = np.zeros(n_pad, np.int64)
    real = to_main != main_pad_row
    inv[to_main[real]] = np.flatnonzero(real)
    return inv


def build_correction_table(layout, st) -> CorrectionTable:
    """Device builder (offload_main_table path: layout.vectors still in
    HBM). Tiled like build_stream_table so transients stay ~3 tile
    buffers; two passes (per-cluster max|err| scan, then quantize +
    absolute norms)."""
    dtype = jnp.dtype(st.dtype)
    (lengths, CHUNK, bases, m_pad, main_pad_row, to_main, row_cid) = (
        _stream_maps(layout, dtype.itemsize, st.chunk)
    )
    assert m_pad == st.m_pad, "correction table must match the stream table"
    kc = len(lengths)
    d = layout.dim
    n_pad = layout.vectors.shape[0]

    R = min(1 << 19, _round_up(m_pad, 8))
    m_t = _round_up(m_pad, R)
    real_np = to_main != main_pad_row
    idx_p = np.full(m_t, main_pad_row, np.int64)
    idx_p[:m_pad] = to_main
    cid_p = np.zeros(m_t, np.int64)
    cid_p[:m_pad] = row_cid
    real_p = np.zeros(m_t, bool)
    real_p[:m_pad] = real_np
    srow_p = np.zeros(m_t, np.int64)
    srow_p[:m_pad] = np.arange(m_pad)

    main_vecs = layout.vectors
    cent = st.cent
    s1 = st.scales
    ntile = m_t // R
    tiles = (
        jnp.asarray(idx_p, jnp.int32).reshape(ntile, R),
        jnp.asarray(cid_p, jnp.int32).reshape(ntile, R),
        jnp.asarray(real_p).reshape(ntile, R),
        jnp.asarray(srow_p, jnp.int32).reshape(ntile, R),
    )

    def err_tile(args):
        it, ct, rt, sr = args
        res = (main_vecs[it] - cent[ct]) * rt[:, None]
        # Dequantized first layer read from the LIVE stream table (not
        # recomputed) so the correction is exact against what the kernel
        # actually sweeps.
        deq1 = st.vecs[sr].astype(jnp.float32) * s1[ct][:, None]
        return res - deq1, deq1

    def p1(carry, args):
        err, _ = err_tile(args)
        m = jnp.max(jnp.abs(err), axis=1) * args[2]
        return carry.at[args[1]].max(m), None

    s2max, _ = jax.lax.scan(p1, jnp.zeros(kc, jnp.float32), tiles)
    scales2 = jnp.maximum(s2max / 127.0, 1e-12)

    def p2(args):
        _, ct, rt, _ = args
        err, deq1 = err_tile(args)
        s2 = scales2[ct][:, None]
        q2 = jnp.clip(jnp.round(err / s2), -127, 127)
        xhat = cent[ct] + deq1 + q2 * s2
        return (
            q2.astype(jnp.int8),
            jnp.where(rt, jnp.sum(xhat * xhat, axis=1), 1e30),
        )

    q2_t, norms_t = jax.lax.map(p2, tiles)
    return CorrectionTable(
        q2=q2_t.reshape(m_t, d)[:m_pad],
        norms_abs=norms_t.reshape(m_t)[:m_pad],
        scales2=scales2,
        inv=jnp.asarray(
            _inv_map(to_main, main_pad_row, n_pad).astype(np.int32)
        ),
        m_pad=m_pad,
    )


def build_correction_table_host(layout, st) -> CorrectionTable:
    """Host (numpy) twin for host-staged layouts (offload_from_host /
    load(..., resident='offload')): only the compact q2/norms/inv arrays
    are uploaded — the f32 corpus never touches HBM. The first layer's
    rows are RE-derived with the exact formulas of build_stream_table_host
    (bit-identical on the host) instead of fetching st.vecs d2h."""
    dtype = jnp.dtype(st.dtype)
    (lengths, CHUNK, bases, m_pad, main_pad_row, to_main, row_cid) = (
        _stream_maps(layout, dtype.itemsize, st.chunk)
    )
    assert m_pad == st.m_pad, "correction table must match the stream table"
    kc = len(lengths)
    d = layout.dim
    vecs_host = np.asarray(layout.vectors)
    n_pad = vecs_host.shape[0]
    cent = np.asarray(st.cent)
    s1 = np.asarray(st.scales)
    real = to_main != main_pad_row

    def _deq1(res, cids):
        if dtype == jnp.int8:
            s = s1[cids][:, None]
            return np.clip(np.round(res / s), -127, 127) * s
        return res.astype(np.dtype(dtype)).astype(np.float32)

    R = 1 << 19
    s2max = np.zeros(kc, np.float32)
    for lo in range(0, m_pad, R):
        hi = min(lo + R, m_pad)
        res = vecs_host[to_main[lo:hi]].astype(np.float32, copy=True)
        res -= cent[row_cid[lo:hi]]
        res[~real[lo:hi]] = 0.0
        err = res - _deq1(res, row_cid[lo:hi])
        m = np.abs(err).max(axis=1) * real[lo:hi]
        np.maximum.at(s2max, row_cid[lo:hi], m.astype(np.float32))
    scales2 = np.maximum(s2max / 127.0, 1e-12)

    out_q2 = np.empty((m_pad, d), np.int8)
    out_norms = np.full(m_pad, 1e30, np.float32)
    for lo in range(0, m_pad, R):
        hi = min(lo + R, m_pad)
        cids = row_cid[lo:hi]
        res = vecs_host[to_main[lo:hi]].astype(np.float32, copy=True)
        res -= cent[cids]
        res[~real[lo:hi]] = 0.0
        deq1 = _deq1(res, cids)
        s2 = scales2[cids][:, None]
        q2 = np.clip(np.round((res - deq1) / s2), -127, 127)
        xhat = cent[cids] + deq1 + q2 * s2
        out_q2[lo:hi] = q2.astype(np.int8)
        out_norms[lo:hi] = np.where(
            real[lo:hi], (xhat * xhat).sum(axis=1), 1e30
        )

    return CorrectionTable(
        q2=jnp.asarray(out_q2),
        norms_abs=jnp.asarray(out_norms),
        scales2=jnp.asarray(scales2),
        inv=jnp.asarray(
            _inv_map(to_main, main_pad_row, n_pad).astype(np.int32)
        ),
        m_pad=m_pad,
    )
