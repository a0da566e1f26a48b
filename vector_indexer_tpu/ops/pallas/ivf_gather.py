"""IVF posting-list gather+distance kernel (range-DMA based).

The TPU-native descendant of the reference's io_uring selective cluster-block
reads (/root/reference/src/shards.rs:255-272): each probed posting list is
one CONTIGUOUS row range of the HBM layout, so the kernel pulls it with
chunked async DMAs (HBM -> VMEM) — bulk sequential transfers instead of the
per-row gather XLA emits for ``vectors[rows]`` (measured ~8 GB/s effective;
contiguous DMA streams at full HBM bandwidth). Distances are computed on the
MXU against the query tile and written into the query's packed candidate
slots; top-k selection runs outside on the (nq, budget) result.

Grid: (queries, probes). Per program: one query row + one probed cluster.
Scalar-prefetched (starts, lengths, slot offsets) drive the DMA addressing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DMA_CHUNK = 512  # rows per sub-DMA; conditional chunks skip past len


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_for(max_len: int) -> int:
    return min(_DMA_CHUNK, _round_up(max(max_len, 8), 8))


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def _kernel_factory(max_len_pad: int, d: int, budget_pad: int, chunk: int):
    nchunk = max_len_pad // chunk

    def kernel(
        starts_ref,  # (nq, p) int32  [scalar prefetch]
        offs_ref,  # (nq, p) int32 — exclusive prefix sums of lengths
        lens_ref,  # (nq, p) int32
        q_ref,  # (1, 1, d) VMEM — this query
        vec_ref,  # (n_pad, d) ANY/HBM — full table
        out_d_ref,  # (1, 1, budget_pad) VMEM — packed distances (revisited)
        out_r_ref,  # (1, 1, budget_pad) VMEM — packed rows (revisited)
        scratch,  # (2, max_len_pad, d) VMEM — double buffer
        sems,  # DMA semaphores (2, nchunk)
    ):
        i = pl.program_id(0)
        j = pl.program_id(1)
        p = pl.num_programs(1)
        nq = pl.num_programs(0)
        g = i * p + j  # global probe index; grid executes in this order
        slot = jax.lax.rem(g, 2)
        nslot = jax.lax.rem(g + 1, 2)

        @pl.when(j == 0)
        def _():
            out_d_ref[:] = jnp.full_like(out_d_ref, jnp.inf)
            out_r_ref[:] = jnp.full_like(out_r_ref, -1)

        start = starts_ref[i, j]
        ln = lens_ref[i, j]
        # Lane-aligned slot base, clamped so overflow degrades to overwrites
        # of earlier (nearer) probes rather than OOB stores.
        off = pl.multiple_of(
            jnp.minimum(offs_ref[i, j], budget_pad - max_len_pad), 128
        )

        def dma(s, st, c):
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(st + c * chunk, chunk), :],
                scratch.at[s, pl.ds(c * chunk, chunk), :],
                sems.at[s, c],
            )

        # Warm-up: the very first probe fetches its own lists (no overlap).
        @pl.when(g == 0)
        def _():
            for c in range(nchunk):
                @pl.when(c * chunk < ln)
                def _(c=c):
                    dma(slot, start, c).start()

        # Pipeline: prefetch probe g+1's lists into the other buffer while
        # this probe's distance ranking runs (the double-buffering pattern;
        # grid programs execute sequentially so the DMA overlaps compute).
        last = nq * p - 1

        @pl.when(g < last)
        def _():
            i1 = jax.lax.div(g + 1, p)
            j1 = jax.lax.rem(g + 1, p)
            st1 = starts_ref[i1, j1]
            ln1 = lens_ref[i1, j1]
            for c in range(nchunk):
                @pl.when(c * chunk < ln1)
                def _(c=c):
                    dma(nslot, st1, c).start()

        # Wait for this probe's buffer (started by the previous program, or
        # by the warm-up above for g==0); table tail padding keeps every
        # full-chunk read in bounds.
        for c in range(nchunk):
            @pl.when(c * chunk < ln)
            def _(c=c):
                pltpu.make_async_copy(
                    vec_ref.at[pl.ds(start + c * chunk, chunk), :],
                    scratch.at[slot, pl.ds(c * chunk, chunk), :],
                    sems.at[slot, c],
                ).wait()

        q = q_ref[0]  # (1, d)
        x = scratch[slot]  # (max_len_pad, d)
        cross = jax.lax.dot_general(
            x, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )[:, 0]  # (max_len_pad,)
        norms = jnp.sum(x * x, axis=1)
        q_sq = jnp.sum(q * q)
        dist = jnp.maximum(q_sq - 2.0 * cross + norms, 0.0)

        idx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)[:, 0]
        valid = idx < ln
        dist = jnp.where(valid, dist, jnp.inf)
        rows = jnp.where(valid, start + idx, -1)
        # Write this probe's packed slot window; tail beyond ln is inf/-1 and
        # is rewritten by later probes (ascending offsets), the global tail
        # stays at the j==0 initialization.
        out_d_ref[0, 0, pl.ds(off, x.shape[0])] = dist
        out_r_ref[0, 0, pl.ds(off, x.shape[0])] = rows

    return kernel, nchunk


@functools.partial(
    jax.jit, static_argnames=("max_len", "budget", "interpret")
)
def ivf_gather_distances(
    queries,  # (nq, d) f32
    vectors,  # (n_pad, d) f32, tail-padded by >= max_len rows
    starts,  # (nq, p) int32 — probed cluster start rows
    lengths,  # (nq, p) int32
    *,
    max_len: int,
    budget: int,
    interpret: bool = False,
):
    """-> (dist (nq, W) f32 inf-padded, rows (nq, W) int32 -1-padded).

    Per-query candidate distances for the probed posting lists in
    nearest-centroid probe order, packed at 128-aligned slot offsets
    (probe j starts at sum of round_up(len, 128) over earlier probes);
    alignment holes are inf/-1. W >= budget + p*128.
    """
    nq, d = queries.shape
    p = starts.shape[1]
    chunk = _chunk_for(max_len)
    max_len_pad = _round_up(max(max_len, 8), chunk)

    # Slot offsets are 128-aligned (Mosaic vector stores need lane-aligned
    # dynamic bases); the aligned gaps are inf/-1 holes the selection skips.
    lens_al = _round_up_arr(lengths, 128)
    offs = jnp.cumsum(lens_al, axis=1) - lens_al  # exclusive prefix sums
    budget_pad = _round_up(budget + p * 128 + max_len_pad, 128)

    kernel, nchunk = _kernel_factory(max_len_pad, d, budget_pad, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nq, p),
        in_specs=[
            pl.BlockSpec(
                (1, 1, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, budget_pad), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, budget_pad), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_len_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nchunk)),
        ],
    )
    dist, rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1, budget_pad), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1, budget_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), offs.astype(jnp.int32),
      lengths.astype(jnp.int32), queries[:, None, :], vectors)
    return dist[:, 0, :], rows[:, 0, :]
