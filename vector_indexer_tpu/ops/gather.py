"""Packed-CSR candidate enumeration for IVF posting lists.

Turning ragged posting lists into a static-shape gather is THE core TPU
difficulty (survey §7 "hard parts"). The naive window of
``n_probe x max_list_len`` rows explodes under cluster-size skew (a single
oversized cluster multiplies the whole gather). Instead, each query packs its
probed lists head-to-tail: with per-probe lengths ``ln`` and prefix sums
``cum``, candidate slot j maps to probe segment ``seg = searchsorted(cum, j)``
and row ``starts[seg] + j - cum[seg-1]``. The static budget C then scales with
the SUM of probed list lengths (concentrated around n_probe * mean) instead of
n_probe * max.

Probes are visited in nearest-centroid-first order, so if a budget ever
truncates, it drops candidates from the farthest probed clusters first —
graceful recall degradation, never a wrong distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_candidate_rows(
    starts: jax.Array,  # (q, p) int32 — start row per probed cluster
    lengths: jax.Array,  # (q, p) int32 — length per probed cluster
    budget: int,  # C, static
    pad_row: int,  # safe row index for invalid slots
):
    """-> (rows (q, C) int32, valid (q, C) bool).

    Unrolled over p with every op laid out (q, C) — the lane dimension stays
    large and 128-aligned. (A searchsorted/take_along_axis formulation lowers
    to serialized per-element gathers on TPU: measured ~50x slower.)
    """
    q, p = starts.shape
    cum = jnp.cumsum(lengths, axis=1)  # inclusive prefix sums
    cum_prev = cum - lengths
    total = cum[:, -1]
    j = jnp.arange(budget, dtype=jnp.int32)[None, :]  # (1, C)

    rows = jnp.full((q, budget), pad_row, jnp.int32)
    for i in range(p):  # static unroll; p = n_probe is small
        inseg = (j >= cum_prev[:, i : i + 1]) & (j < cum[:, i : i + 1])
        rows = jnp.where(
            inseg, starts[:, i : i + 1] + (j - cum_prev[:, i : i + 1]), rows
        )
    valid = j < total[:, None]
    return rows, valid


def quantize_up(x: int) -> int:
    """Round up to the {2^m, 1.5*2^m} grid. Static shapes derived from data
    (budgets, slot counts) land on a coarse grid so nearby operating points
    (nprobe sweep steps, reloads with slightly different list skew) reuse one
    compiled program — compiles cost 3-300 s in this environment — at <= 33%
    shape overshoot."""
    if x <= 1:
        return 1
    m = 1 << (x - 1).bit_length()  # next pow2 >= x
    # 0.75*m is the grid point between 2^(m-1) and 2^m.
    return m - (m >> 2) if x <= m - (m >> 2) else m


def candidate_budget(
    lengths_np, n_probe: int, cap: int | None = None, align: int = 128
) -> int:
    """Static budget C: sum of the n_probe longest lists (never truncates),
    quantized up to the {2^m, 1.5*2^m} grid (always 128-aligned beyond 128)
    for compile reuse. Callers may pass ``cap`` to trade recall for speed."""
    import numpy as np

    ln = np.sort(np.asarray(lengths_np))[::-1]
    c = int(ln[: min(n_probe, len(ln))].sum())
    c = max(align, quantize_up(c))
    if cap is not None:
        c = min(c, cap)
    return -(-c // align) * align
