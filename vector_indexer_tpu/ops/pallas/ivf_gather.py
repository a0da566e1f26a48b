"""IVF posting-list gather+distance kernel (range-DMA based).

The TPU-native descendant of the reference's io_uring selective cluster-block
reads (/root/reference/src/shards.rs:255-272): each probed posting list is a
CONTIGUOUS row range of the HBM layout, so the kernel pulls all of a query's
probed lists with concurrent chunked async DMAs (HBM -> VMEM) — bulk
sequential transfers instead of the per-row gather XLA emits for
``vectors[rows]`` (measured ~8 GB/s effective; contiguous DMA streams at full
HBM bandwidth). Distances are computed on the MXU against the query and
written into the query's packed candidate slots; top-k selection runs outside
on the (nq, W) result.

Grid: (queries,). Per program: ONE query, ALL its probes — every probed
list's DMAs are started before any wait, so transfer latency overlaps across
probes (the analogue of the reference's join_all fan-out,
ivf_index.rs:249). Scalar-prefetched (starts, offsets, lengths) drive the
DMA addressing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DMA_CHUNK = 512  # rows per sub-DMA; conditional chunks skip past len
VMEM_SCRATCH_CAP = 12 * 1024 * 1024  # fallback guard for the caller


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_for(max_len: int) -> int:
    return min(_DMA_CHUNK, _round_up(max(max_len, 8), 8))


def _round_up_arr(x, m):
    return ((x + m - 1) // m) * m


def scratch_bytes(p: int, max_len: int, d: int) -> int:
    """VMEM scratch the kernel would need; callers fall back to the XLA
    gather when this exceeds VMEM_SCRATCH_CAP."""
    chunk = _chunk_for(max_len)
    return p * _round_up(max(max_len, 8), chunk) * d * 4


def _kernel_factory(
    p: int, max_len_pad: int, d: int, budget_pad: int, chunk: int,
    metric: str = "l2",
):
    nchunk = max_len_pad // chunk

    def kernel(
        starts_ref,  # (nq, p) int32  [scalar prefetch]
        offs_ref,  # (nq, p) int32 — 128-aligned packed slot offsets
        lens_ref,  # (nq, p) int32
        q_ref,  # (1, 1, d) VMEM — this query
        vec_ref,  # (n_pad, d) ANY/HBM — full table
        out_d_ref,  # (1, 1, budget_pad) VMEM
        out_r_ref,  # (1, 1, budget_pad) VMEM
        scratch,  # (p, max_len_pad, d) VMEM
        sems,  # DMA semaphores (p, nchunk)
    ):
        i = pl.program_id(0)

        out_d_ref[:] = jnp.full_like(out_d_ref, jnp.inf)
        out_r_ref[:] = jnp.full_like(out_r_ref, -1)

        def dma(j, c, start):
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(start + c * chunk, chunk), :],
                scratch.at[j, pl.ds(c * chunk, chunk), :],
                sems.at[j, c],
            )

        # Fan out: start EVERY probe's chunked DMAs before waiting on any —
        # transfers for all probed lists stream concurrently.
        for j in range(p):
            start = starts_ref[i, j]
            ln = lens_ref[i, j]
            for c in range(nchunk):
                @pl.when(c * chunk < ln)
                def _(j=j, c=c, start=start):
                    dma(j, c, start).start()

        for j in range(p):
            start = starts_ref[i, j]
            ln = lens_ref[i, j]
            for c in range(nchunk):
                @pl.when(c * chunk < ln)
                def _(j=j, c=c, start=start):
                    dma(j, c, start).wait()

        # One MXU matvec over all probes' rows at once. HIGHEST precision:
        # the in-kernel default is a single bf16 pass, which silently skews
        # f32 distances (see block_stream._dot_precision).
        q = q_ref[0]  # (1, d)
        x = scratch[:].reshape(p * max_len_pad, d)
        cross = jax.lax.dot_general(
            x, q, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )[:, 0]
        if metric == "l2":
            norms = jnp.sum(x * x, axis=1)
            q_sq = jnp.sum(q * q)
            dist_all = jnp.maximum(q_sq - 2.0 * cross + norms, 0.0)
        else:
            # ip (cosine = ip over unit vectors, normalized upstream):
            # smaller = better = -q.x. Only REAL posting rows are gathered
            # (the per-probe valid mask infs the padding), so no sentinel
            # handling is needed here unlike the sweep kernels.
            dist_all = -cross
        idx_all = jax.lax.broadcasted_iota(jnp.int32, (p * max_len_pad, 1), 0)[:, 0]

        for j in range(p):
            ln = lens_ref[i, j]
            off = pl.multiple_of(
                jnp.minimum(offs_ref[i, j], budget_pad - max_len_pad), 128
            )
            start = starts_ref[i, j]
            seg = slice(j * max_len_pad, (j + 1) * max_len_pad)
            local_idx = idx_all[seg] - j * max_len_pad
            valid = local_idx < ln
            out_d_ref[0, 0, pl.ds(off, max_len_pad)] = jnp.where(
                valid, dist_all[seg], jnp.inf
            )
            out_r_ref[0, 0, pl.ds(off, max_len_pad)] = jnp.where(
                valid, start + local_idx, -1
            )

    return kernel, nchunk


@functools.partial(
    jax.jit, static_argnames=("max_len", "budget", "metric", "interpret")
)
def ivf_gather_distances(
    queries,  # (nq, d) f32
    vectors,  # (n_pad, d) f32, tail-padded by >= round_up(max_len, 512) rows
    starts,  # (nq, p) int32 — probed cluster start rows
    lengths,  # (nq, p) int32
    *,
    max_len: int,
    budget: int,
    metric: str = "l2",
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

    kernel, nchunk = _kernel_factory(
        p, max_len_pad, d, budget_pad, chunk, metric
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, budget_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, budget_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, max_len_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA((p, nchunk)),
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
