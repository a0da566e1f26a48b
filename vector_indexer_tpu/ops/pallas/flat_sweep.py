"""Fused exhaustive-sweep + on-chip selection Pallas kernels (flat/dense).

Why fuse (measured, v5e): the XLA flat path materializes the (nq, n) f32
distance matrix in HBM and hands it to ``approx_min_k``, whose
PartialReduce is cheap ONLY when XLA fuses it into the matmul's epilogue
(~2.6 ms/kilobatch at n=100k). Any selection over an already-materialized
plane — approx or exact top_k — costs ~11 ms/kilobatch nearly independent
of column count down to ~12k columns, which is more than the whole XLA
flat program (5.2 ms). So a faster flat path must (a) never materialize
the distance matrix and (b) hand the outer top_k a plane narrow enough to
sit at the cheap end of the selection curve. Two kernels:

* ``flat_sweep_minreduce`` — distance matmul fused with a w-way windowed
  arg-min; an n/w-column survivor plane reaches HBM. Sweeps at 1.92
  ms/kilobatch (n=100k, w=8, HIGHEST) but leaves a 12k-column selection
  problem: kept for diagnostics and as the building block reference.
* ``flat_sweep_topk_plane`` — the serving kernel: windowed arg-min PLUS a
  per-lane (best, second-best) accumulator folded across grid steps into
  C VMEM-resident output groups, so a FIXED 2*C*S-column plane (2048 at
  C=8) reaches HBM regardless of n.

Window semantics: the NB = 128*w table rows of grid step j are
partitioned into 128 strided windows — output lane c covers rows
{j*NB + jj*128 + c : jj < w}. A strided partition keeps every select on
full 128-lane registers (no sublane ops), and which rows share a window
is irrelevant to the recall math (distances are exchangeable across
positions). The window min always keeps the true nearest row (it is the
min of its own window); the expected loss for exact top-k is the
probability two of the true top-k share a window, ~k(k-1)*w/(2n) — at
the default w schedule this stays under ~1% at k=100 and is 0 for k=1.
Values are exact f32 (HIGHEST matmul), so the loss is purely which
candidates survive, never the returned distances.

Masked (IVF dense) variant: an optional per-(query, ALIGN-row-block)
f32 mask — the same block-level probe mask the XLA dense path builds by
scattering membership deltas at run starts (index/ivf.py
_ivf_search_dense_program) — is expanded in-kernel to row granularity
and applied BEFORE the windowed min (an unprobed row must never shadow
a probed one inside its window). There is no per-element lane repeat on
TPU (pltpu.repeat tiles whole copies), so the expansion is a 0/1
expansion matmul m @ E with E[r, 8r..8r+7] = 1 — exact in bf16 (0/1
values), and ~w/48 of the main distance matmul's MXU passes (17% at
w=8), far cheaper than materializing a row-level mask in HBM.

Sweep precisions: 'highest' (6 bf16 MXU passes, exact f32), '3pass'
(bf16 hi/lo split, 3 passes — the serving default; values within f32
noise of exact), and the explicit approximate modes 'int8' / 'int8x1'
(fixed-point int8 over a pre-quantized table from
``quantize_table_int8``; int8 MXU passes run at 2x the bf16 rate, so
'int8' ~= 1.5 and 'int8x1' ~= 0.5 bf16-pass-equivalents, at 2 B / 1 B
per element of HBM traffic). The int8 residual scales are pinned to
1/SHIFT of the main scales so all int8 cross terms accumulate in ONE
int32 plane — the dequant epilogue costs one cast + two muls regardless
of pass count (the VPU epilogue, not the MXU, is the int8 modes' floor).

Reference parity: TPU replacement for the reference's exhaustive re-rank
loop at flat operating points (/root/reference/src/ivf_index.rs:251-266);
selection replaces the full candidate sort (ivf_index.rs:264-266).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128  # survivor lanes per grid step (one full lane register)
MASK_ALIGN = 8  # rows per mask element (== storage.layout.ALIGN)

# Fixed-point int8 sweep (precision='int8'/'int8x1'): residual and query
# -residual scales are pinned to 1/SHIFT of the main scales so the three
# int8 cross terms accumulate in ONE int32 plane before a single
# dequantizing epilogue (see _window_min_step). Worst-case accumulator
# magnitude is SHIFT*127^2*d (main term) + 2*(SHIFT/2)*127*d (the two
# residual cross terms — residual codes round a half-grid-step remainder
# scaled by SHIFT, so they are bounded by SHIFT/2 = 32, not 127) =
# ~2.131e9 at d=2048 — inside int32 (2.147e9) with only ~0.8% headroom.
# Any SHIFT or INT8_MAX_D bump must re-check the assert below.
SHIFT = 64
INT8_MAX_D = 2048
assert (SHIFT * 127 + 2 * (SHIFT // 2)) * 127 * INT8_MAX_D < 2**31


@jax.jit
def quantize_table_int8(vectors):
    """Per-row symmetric int8 quantization with an int8 fixed-point
    residual: x ~= sx*x8 + (sx/SHIFT)*r8, sx = max|row|/127. The residual
    bounds the reconstruction error at sx/(2*SHIFT) (~1e-4 absolute for
    unit-variance rows) — near-f32 table fidelity at 2 bytes/element.
    Zero (gap/tail) rows quantize to zeros under the 1e-30 scale guard.
    Returns (x8 (n,d) int8, r8 (n,d) int8, sx (n,) f32)."""
    ax = jnp.max(jnp.abs(vectors), axis=1, keepdims=True)
    sx = jnp.maximum(ax, 1e-30) / 127.0
    x8 = jnp.round(vectors / sx).astype(jnp.int8)
    r8 = jnp.round(
        (vectors - x8.astype(jnp.float32) * sx) * (SHIFT / sx)
    ).astype(jnp.int8)
    return x8, r8, sx[:, 0]


def pick_window(n_rows: int, k: int) -> int:
    """Window width w: as large as survivor-plane traffic allows while the
    expected top-k loss k(k-1)w/2n stays ~<1%. Powers of two in [8, 32]
    (w=64 would need an 8 MB x-block double buffer — over VMEM with the
    distance tile)."""
    w = 8
    while w < 32 and n_rows // (2 * w) >= 16384 and k * k * 2 * w <= n_rows:
        w *= 2
    return w


def pick_groups(n_rows: int, w: int, k: int) -> int:
    """Accumulator group count C for ``flat_sweep_topk_plane``: the output
    plane is 2*C*S columns (top-2 per lane). C=8 (2048-column plane) keeps
    the epilogue ``top_k`` cheap while the expected tail loss stays ~0.5%
    at k=100 (see flat_sweep_topk_plane docstring); shrink C only when the
    sweep itself has fewer grid steps than groups."""
    nj = -(-n_rows // (S * w))
    c = 8
    while c > 1 and c > nj:
        c //= 2
    return c


def plan_fused(n_rows: int, d: int, nq: int, k: int, precision: str = "highest"):
    """(w, q_tile, c_groups) sized to VMEM, or None if the fused path
    should not be used for this operating point.

    Quality gate: expected top-k tail loss = per-candidate window
    collisions (k-1)*w/2n + lane-stream triple collisions
    (k-1)(k-2)/2(C*S)^2 must stay within the approx contract (~1.5%,
    matching the XLA path's recall_target=0.99), and the 2*C*S plane
    must hold at least 2k candidates — large k falls back to XLA.

    Budget model (bytes, ~13 MB of the v5e's 16 MB VMEM): double-buffered
    x block 2*NB*d*4, query block q_tile*d*4, four resident accumulator
    planes 4*q_tile*C*S*4, and ~2 distance-transient copies q_tile*NB*4*2.
    """
    # Plan-shape verdict (2026-08-18, measured at n=1M): the sweep is
    # MXU-COMPUTE-bound, not HBM-bound — (w=32, q_tile=128) runs 1.57
    # TFLOP of 6-pass HIGHEST matmul in 10.25 ms (~78% MXU peak), and a
    # (w=8, q_tile=384) plan with 2.7x FEWER table sweeps measured
    # SLOWER (11.53 ms: more grid steps, same total FLOPs). So the plan
    # keeps w as large as VMEM/loss allow (fewer steps) and only then
    # sizes q_tile; the perf lever is the matmul pass count (see the
    # '3pass' precision mode), not the sweep byte count.
    int8_mode = precision in ("int8", "int8x1")
    if int8_mode and d > INT8_MAX_D:
        # int32 accumulator bound (SHIFT*127^2*d) — fall back to XLA.
        return None
    # Table-block bytes/element: f32 sweeps read one 4 B ref; 'int8' reads
    # two 1 B refs (values + residual); 'int8x1' one 1 B ref.
    xb = {"int8": 2, "int8x1": 1}.get(precision, 4)
    # int8 adds an int32 cross-term transient before the f32 dequant.
    trans = 3 if int8_mode else 2
    w = pick_window(n_rows, k)
    while w > 4 and 2 * (S * w) * d * xb > 6 << 20:
        w //= 2
    c = pick_groups(n_rows, w, k)
    cs = c * S
    loss = (k - 1) * w / (2.0 * max(n_rows, 1)) + (
        (k - 1) * max(k - 2, 0) / (2.0 * cs * cs)
    )
    if k > cs or loss > 0.015:
        return None
    for q_tile in (512, 256, 128, 64):
        nb = S * w
        need = (
            2 * nb * d * xb
            + q_tile * d * 4
            + 4 * q_tile * c * S * 4
            + trans * q_tile * nb * 4
        )
        if need <= 13 << 20:
            return w, min(q_tile, max(8, -(-nq // 8) * 8)), c
    return None


def _window_min_step(
    refs, j, *, w, metric, masked, n_rows, prec
):
    """Shared per-grid-step body of both sweep kernels: distance matmul
    (precision ``prec``), sentinel/tail/mask handling, then the w-way
    strided windowed arg-min. Returns (step_v (Q, S), step_i (Q, S))
    where step_i are global table row ids.

    Ref order: q, x, (resid if prec=='int8'), norms, (scales if int8
    mode), (mask, expand if masked)."""
    NB = S * w
    it = iter(refs)
    q_ref = next(it)
    x_ref = next(it)
    r_ref = next(it) if prec == "int8" else None
    n_ref = next(it)
    s_ref = next(it) if prec in ("int8", "int8x1") else None
    m_ref = e_ref = None
    if masked:
        m_ref = next(it)
        e_ref = next(it)
    if prec in ("int8", "int8x1"):
        # Fixed-point int8 sweep: table rows arrive pre-quantized
        # (x ~= sx*x8 + (sx/SHIFT)*r8, quantize_table_int8); queries are
        # quantized in-kernel per step (q ~= sq*q8 + (sq/SHIFT)*qr8 —
        # (Q, d) VPU work, negligible vs the (Q, NB) epilogue). Pinning
        # the residual scales to main/SHIFT lets all three int8 cross
        # terms accumulate in ONE int32 plane, so the dequant epilogue
        # costs one cast + two muls regardless of pass count. int8 MXU
        # passes run at 2x the bf16 rate, so 'int8' ~= 1.5 and 'int8x1'
        # ~= 0.5 bf16-pass-equivalents vs 3 for '3pass' and 6 for
        # HIGHEST. Values are approximate: the dropped qr8.r8 term and
        # the int8 grids bound the cross error at ~1e-2 ('int8') /
        # ~0.3 ('int8x1') absolute for unit-variance d=128 data — row
        # norms stay exact f32, so the error enters via the cross term
        # only (measured isotropic n=100k R@10: 0.999 / 0.98).
        def _doti(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        q = q_ref[:]
        sq = (
            jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-30)
            / 127.0
        )
        inv = 1.0 / sq
        q8 = jnp.round(q * inv).astype(jnp.int8)
        x8 = x_ref[:]
        if prec == "int8":
            qr = q - q8.astype(jnp.float32) * sq
            qr8 = jnp.round(qr * (inv * float(SHIFT))).astype(jnp.int8)
            t = (
                SHIFT * _doti(q8, x8)
                + _doti(q8, r_ref[:])
                + _doti(qr8, x8)
            )
            row_mul = s_ref[0, :] * (1.0 / SHIFT)
        else:
            t = _doti(q8, x8)
            row_mul = s_ref[0, :]
        cross = t.astype(jnp.float32) * row_mul[None, :] * sq
    elif prec == "3pass":
        x = x_ref[:]  # (NB, d) f32 table rows
        # bf16 hi/lo split product: qh.xh + qh.xl + ql.xh — halves the
        # MXU passes vs HIGHEST (TPU HIGHEST = 6 bf16 passes; Mosaic has
        # no HIGH). The dropped ql.xl term is <= 2^-18 of |q||x|, BELOW
        # f32 dot accumulation noise (validated: max delta vs a float64
        # oracle is not worse than HIGHEST's — see test_flat_sweep).
        # The split runs on the VPU per step; the query-side split is
        # (Q, d), negligible.
        def _dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )

        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        q = q_ref[:]
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        cross = _dot(qh, xh) + _dot(qh, xl) + _dot(ql, xh)
    else:
        cross = jax.lax.dot_general(
            q_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # (Q, NB) exact f32
    nrm = n_ref[0, :]  # (NB,) f32; SENTINEL on gap/tail rows
    if metric == "l2":
        dist = nrm[None, :] - 2.0 * cross
    else:  # ip: smaller = better = -q.x; sentinel rows penalized
        dist = jnp.where(nrm >= 1e29, nrm, 0.0)[None, :] - cross
    Q = dist.shape[0]
    base = j * NB
    if n_rows % NB:
        # Tail grid step reads past the table: those lanes may hold
        # garbage (even NaN) — force them out via the padded side of
        # the where.
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, NB), 1)
        dist = jnp.where(base + col < n_rows, dist, jnp.inf)
    if masked:
        # Row-level mask = block mask @ 0/1 expansion (exact; see the
        # module docstring for why not a lane repeat).
        m = jax.lax.dot_general(
            m_ref[:].astype(jnp.bfloat16), e_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, NB)
        dist = jnp.where(m > 0.5, dist, jnp.inf)

    best_v = dist[:, :S]
    best_j = jnp.zeros((Q, S), jnp.int32)
    for jj in range(1, w):
        cand = dist[:, jj * S : (jj + 1) * S]
        better = cand < best_v
        best_v = jnp.where(better, cand, best_v)
        best_j = jnp.where(better, jj, best_j)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, S), 1)
    return best_v, base + best_j * S + lane


def _acc_kernel_factory(
    d: int,
    w: int,
    c_groups: int,
    metric: str,
    masked: bool,
    n_rows: int,
    precision: str = "highest",
):
    # 'highest': one 6-bf16-pass exact dot. '3pass': bf16 hi/lo split
    # (see _window_min_step) — Mosaic rejects Precision.HIGH, so the
    # 3-pass decomposition is spelled out manually. 'int8'/'int8x1':
    # fixed-point int8 passes over a pre-quantized table.
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else precision
    )

    def kernel(*refs):
        in_refs, (v1, i1, v2, i2) = refs[:-4], refs[-4:]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            v1[:] = jnp.full(v1.shape, jnp.inf, jnp.float32)
            v2[:] = jnp.full(v2.shape, jnp.inf, jnp.float32)
            i1[:] = jnp.full(i1.shape, -1, jnp.int32)
            i2[:] = jnp.full(i2.shape, -1, jnp.int32)

        best_v, step_i = _window_min_step(
            in_refs, j, w=w, metric=metric, masked=masked, n_rows=n_rows,
            prec=prec,
        )

        # Top-2 insert into accumulator group j % C (aligned dynamic lane
        # slice): the step value displaces the lane's best or second-best;
        # the displaced best falls through to the second slot.
        off = jax.lax.rem(j, c_groups) * S
        sl = (slice(None), pl.ds(off, S))
        cur_v1, cur_i1 = v1[sl], i1[sl]
        cur_v2, cur_i2 = v2[sl], i2[sl]
        b1 = best_v < cur_v1
        v1[sl] = jnp.where(b1, best_v, cur_v1)
        i1[sl] = jnp.where(b1, step_i, cur_i1)
        loser_v = jnp.where(b1, cur_v1, best_v)
        loser_i = jnp.where(b1, cur_i1, step_i)
        b2 = loser_v < cur_v2
        v2[sl] = jnp.where(b2, loser_v, cur_v2)
        i2[sl] = jnp.where(b2, loser_i, cur_i2)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "w", "c_groups", "q_tile", "precision", "interpret"
    ),
)
def flat_sweep_topk_plane(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0
    vectors,  # (n_rows, d) f32 table — int8 under the int8 precisions
    row_norms,  # (n_rows,) f32; SENTINEL_NORM on gap/tail rows
    mask_b=None,  # optional (nq_pad, nj*NB/MASK_ALIGN) f32 block mask
    vec_resid=None,  # (n_rows, d) int8 fixed-point residual (prec 'int8')
    scale_row=None,  # (n_rows,) f32 per-row int8 scales (int8 precisions)
    *,
    metric: str = "l2",
    w: int = 8,
    c_groups: int = 8,
    q_tile: int = 512,
    precision: str = "highest",
    interpret: bool = False,
):
    """Sweep the table, folding survivors into a FIXED-width plane on-chip.

    Unlike ``flat_sweep_minreduce`` (whose n/w-column survivor plane makes
    the epilogue ``top_k`` the bottleneck — TPU selection cost is ~flat in
    column count above ~2k), the accumulator variant keeps per-lane
    (best, second-best) pairs across grid steps in C VMEM-resident output
    groups, so only 2*C*S columns (2048 at C=8) ever reach HBM and the
    epilogue selection runs at the cheap end of the selection curve.

    Loss model (values stay exact f32): a candidate is lost only by rank
    inside its own (window, group, lane) stream. The true nearest neighbor
    is NEVER lost (it is the min of its window and therefore the best of
    its lane stream). Expected top-k tail loss = within-window collisions
    k(k-1)w/2n (0.4% at k=100, w=8, n=100k) + triple-collisions in a lane
    stream C(k,3)/(C*S)^2 (~0.15%) — comparable to the XLA path's
    approx_min_k recall_target=0.99 contract.

    Returns (vals, rows): each (nq_pad, 2*C*S); vals are exact f32 WITHOUT
    the lane-constant per-query term (q_sq for l2 — add after selection),
    +inf on never-filled/masked slots; rows are global table row ids (-1
    on unfilled slots).

    Reference parity: replaces the reference's exhaustive scan + full sort
    (/root/reference/src/ivf_index.rs:251-266) with a two-stage on-chip
    selection.
    """
    nq_pad, d = queries.shape
    n_rows = vectors.shape[0]
    NB = S * w
    nj = pl.cdiv(n_rows, NB)
    ni = nq_pad // q_tile
    assert nq_pad % q_tile == 0 and d % 128 == 0
    CS = c_groups * S

    masked = mask_b is not None
    int8_mode = precision in ("int8", "int8x1")
    if int8_mode:
        assert vectors.dtype == jnp.int8 and scale_row is not None
        assert (precision != "int8") or (vec_resid is not None)
        assert d <= INT8_MAX_D  # int32 accumulator bound (SHIFT*127^2*d)
    kernel = _acc_kernel_factory(
        d, w, c_groups, metric, masked, n_rows, precision
    )

    table_spec = pl.BlockSpec(
        (NB, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, NB), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((q_tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        table_spec,
    ]
    args = [queries, vectors]
    if precision == "int8":
        in_specs.append(table_spec)
        args.append(vec_resid)
    in_specs.append(row_spec)
    args.append(row_norms.reshape(1, -1))
    if int8_mode:
        in_specs.append(row_spec)
        args.append(scale_row.reshape(1, -1))
    if masked:
        in_specs.append(
            pl.BlockSpec(
                (q_tile, NB // MASK_ALIGN), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_b)
        nbb = NB // MASK_ALIGN
        expand = (
            jax.lax.broadcasted_iota(jnp.int32, (nbb, NB), 1) // MASK_ALIGN
            == jax.lax.broadcasted_iota(jnp.int32, (nbb, NB), 0)
        ).astype(jnp.bfloat16)
        in_specs.append(
            pl.BlockSpec(
                (nbb, NB), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(expand)

    # Accumulator planes live in the output blocks themselves: the index
    # map ignores j, so each (q_tile, CS) block stays VMEM-resident for a
    # query tile's whole j sweep and is flushed to HBM once.
    acc_spec = pl.BlockSpec(
        (q_tile, CS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    acc_shape = jax.ShapeDtypeStruct((nq_pad, CS), jnp.float32)
    idx_shape = jax.ShapeDtypeStruct((nq_pad, CS), jnp.int32)
    v1, i1, v2, i2 = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=(acc_spec, acc_spec, acc_spec, acc_spec),
        out_shape=(acc_shape, idx_shape, acc_shape, idx_shape),
        cost_estimate=pl.CostEstimate(
            # bf16-pass-equivalents: HIGHEST=6, 3pass=3, int8~1.5 (3 int8
            # passes at 2x rate), int8x1~0.5 (rounded up for the int ones).
            flops={"highest": 6, "3pass": 3, "int8": 2, "int8x1": 1}[
                precision
            ]
            * 2 * nq_pad * n_rows * d,
            bytes_accessed=(
                ni * n_rows * d
                * {"int8": 2, "int8x1": 1}.get(precision, 4)
                + 4 * nq_pad * CS * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    vals = jnp.concatenate([v1, v2], axis=1)
    rows = jnp.concatenate([i1, i2], axis=1)
    return vals, rows


def _kernel_factory(d: int, w: int, metric: str, masked: bool, n_rows: int):
    def kernel(*refs):
        in_refs, (out_v, out_i) = refs[:-2], refs[-2:]
        # q_sq is lane-constant per query: added OUTSIDE, after the
        # windowed min (it commutes with per-query selection).
        out_v[:], out_i[:] = _window_min_step(
            in_refs, pl.program_id(1), w=w, metric=metric, masked=masked,
            n_rows=n_rows, prec=jax.lax.Precision.HIGHEST,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "w", "q_tile", "interpret")
)
def flat_sweep_minreduce(
    queries,  # (nq_pad, d) f32, nq_pad % q_tile == 0
    vectors,  # (n_rows, d) f32 table (cluster-permuted or raw)
    row_norms,  # (n_rows,) f32; SENTINEL_NORM on gap/tail rows
    mask_b=None,  # optional (nq_pad, ceil(n_rows/8) padded to NB/8 grid) f32
    *,
    metric: str = "l2",
    w: int = 8,
    q_tile: int = 512,
    interpret: bool = False,
):
    """Sweep the whole table, returning per-query windowed minima.

    Returns (vals, rows): each (nq_pad, nj*S) where nj = ceil(n/NB); vals
    are exact f32 distances WITHOUT the lane-constant per-query term
    (q_sq for l2 — add after selection), +inf on masked/tail lanes; rows
    are global table row ids.
    """
    nq_pad, d = queries.shape
    n_rows = vectors.shape[0]
    NB = S * w
    nj = pl.cdiv(n_rows, NB)
    ni = nq_pad // q_tile
    assert nq_pad % q_tile == 0 and d % 128 == 0

    masked = mask_b is not None
    kernel = _kernel_factory(d, w, metric, masked, n_rows)

    in_specs = [
        pl.BlockSpec((q_tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [queries, vectors, row_norms.reshape(1, -1)]
    if masked:
        in_specs.append(
            pl.BlockSpec(
                (q_tile, NB // MASK_ALIGN), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_b)
        nbb = NB // MASK_ALIGN
        expand = (
            jax.lax.broadcasted_iota(jnp.int32, (nbb, NB), 1) // MASK_ALIGN
            == jax.lax.broadcasted_iota(jnp.int32, (nbb, NB), 0)
        ).astype(jnp.bfloat16)
        in_specs.append(
            pl.BlockSpec(
                (nbb, NB), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(expand)

    out_spec = pl.BlockSpec(
        (q_tile, S), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    vals, rows = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nq_pad, nj * S), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, nj * S), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            # HIGHEST f32 runs multiple MXU passes; count them so the
            # scheduler knows this grid is compute-heavy.
            flops=6 * 2 * nq_pad * n_rows * d,
            bytes_accessed=ni * n_rows * d * 4 + 2 * nq_pad * nj * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return vals, rows
