"""Batched smallest-k selection and streaming top-k merge.

The reference sorts every candidate list in full and slices k
(/root/reference/src/ivf_index.rs:215-220, 264-266). On TPU we use
``lax.top_k`` (O(n log k) hardware sort network) on negated distances, and a
tournament-style merge so multi-chunk / multi-shard candidate streams never
materialize a global sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import pairwise_sq_l2, sq_norms


def topk_smallest(dists: jax.Array, k: int):
    """Smallest-k along the last axis. dists: (..., n) -> (vals, idx) each (..., k).

    If k > n the result is padded with +inf values / -1 indices so callers
    always see a static (..., k) shape (the bindings' (D, I) contract,
    reference bindings/python/src/lib.rs:179-187).
    """
    n = dists.shape[-1]
    kk = min(k, n)
    neg_vals, idx = jax.lax.top_k(-dists, kk)
    vals = -neg_vals
    if kk < k:
        pad = [(0, 0)] * (dists.ndim - 1) + [(0, k - kk)]
        vals = jnp.pad(vals, pad, constant_values=jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=-1)
    return vals, idx


def merge_topk(vals_a, idx_a, vals_b, idx_b, k: int):
    """Merge two (..., ka)/(..., kb) partial top-k streams into top-k."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    mvals, pos = topk_smallest(vals, k)
    midx = jnp.take_along_axis(idx, jnp.where(pos < 0, 0, pos), axis=-1)
    midx = jnp.where(pos < 0, -1, midx)
    return mvals, midx


@functools.partial(jax.jit, static_argnames=("k", "db_chunk", "metric"))
def brute_force_topk(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    db_chunk: int = 65536,
    metric: str = "l2",
    db_row_norms: jax.Array | None = None,
):
    """Exact k-NN oracle: (nq, d) x (n, d) -> (D (nq,k), I (nq,k)).

    Streams the database through fixed-size chunks with a running top-k merge,
    so arbitrarily large corpora fit: peak memory is nq*db_chunk floats.
    This is both the ground-truth generator for tests/benchmarks (the
    reference shells out to faiss IndexFlatL2 for this,
    bench/faiss_bench_official/bench_all_ivf.py:255-265) and the
    high-batch exact search path.

    ``metric``: 'l2' (squared L2) or 'ip' (returns negated inner product, so
    smaller = more similar; cosine = normalize inputs then 'ip').

    ``db_row_norms``: optional (n,) row-norm array used ONLY as a validity
    mask: rows with norm >= 1e29 (the packed layout's gap/tail SENTINEL;
    their VECTORS duplicate a real row — the packing gather clamps perm=-1
    to row 0 — so they cannot be filtered from the vector data itself) are
    excluded from the result. Lets callers brute-force an IvfIndex layout
    table directly (GT without a second corpus upload).
    """
    nq, d = queries.shape
    n = db.shape[0]
    q_sq = sq_norms(queries)

    n_pad = -(-n // db_chunk) * db_chunk
    dbp = jnp.pad(db, ((0, n_pad - n), (0, 0)))
    num_chunks = n_pad // db_chunk
    chunks = dbp.reshape(num_chunks, db_chunk, d)
    if db_row_norms is not None:
        nrm_chunks = jnp.pad(
            db_row_norms, (0, n_pad - n), constant_values=1e30
        ).reshape(num_chunks, db_chunk)
    else:
        nrm_chunks = jnp.zeros((num_chunks, 1), jnp.float32)  # no-op mask

    # Row validity mask for the padded tail chunk.
    base_iota = jnp.arange(db_chunk)

    def step(carry, inp):
        best_v, best_i = carry
        chunk, c_start, cn = inp
        if metric == "l2":
            dmat = pairwise_sq_l2(queries, chunk, x_sq=q_sq)  # (nq, db_chunk)
        else:  # ip: smaller = more-negative similarity
            dmat = -jnp.dot(
                queries, chunk.T,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        rows = c_start + base_iota
        dmat = jnp.where((rows < n)[None, :], dmat, jnp.inf)
        dmat = jnp.where((cn >= 1e29)[None, :], jnp.inf, dmat)
        v, i = topk_smallest(dmat, k)
        gi = jnp.where(i >= 0, rows[jnp.where(i < 0, 0, i)], -1)
        best_v, best_i = merge_topk(best_v, best_i, v, gi, k)
        return (best_v, best_i), None

    init_v = jnp.full((nq, k), jnp.inf, dtype=jnp.float32)
    init_i = jnp.full((nq, k), -1, dtype=jnp.int32)
    starts = jnp.arange(num_chunks) * db_chunk
    (vals, idx), _ = jax.lax.scan(
        step, (init_v, init_i), (chunks, starts, nrm_chunks)
    )
    return vals, idx
