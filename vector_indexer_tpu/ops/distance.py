"""Squared-L2 distance kernels (MXU-tiled).

The hot op of the whole framework. The reference computes one scalar distance
per (point, centroid) pair with CPU SIMD (compute_distance_simd,
/root/reference/src/kmeans.rs:377-419). On TPU the idiomatic form is a single
matrix product: D = ||x||^2 - 2 X C^T + ||c||^2, which XLA tiles onto the
128x128 systolic array. All functions are jittable and static-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# f32 inputs -> HIGHEST keeps the matmul in (multi-pass) f32 on the MXU so
# distances are exact enough for re-rank parity; callers can pre-cast the
# operands to bf16 for 2x throughput where recall tolerates it.
_PRECISION = jax.lax.Precision.HIGHEST


def sq_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms. x: (n, d) -> (n,)."""
    return jnp.sum(x * x, axis=-1)


def pairwise_sq_l2(
    x: jax.Array,
    c: jax.Array,
    c_sq: jax.Array | None = None,
    x_sq: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Full pairwise squared-L2 matrix. x: (n, d), c: (k, d) -> (n, k).

    Precomputed norms may be passed to amortize them across calls (the coarse
    quantizer reuses centroid norms for every query batch). ``precision``
    defaults to HIGHEST (exact f32 passes); pass
    ``jax.lax.Precision.DEFAULT`` for single-pass bf16 inputs where argmin
    ties may flip (e.g. k-means training iterations) at ~3x MXU throughput.
    """
    if x_sq is None:
        x_sq = sq_norms(x)
    if c_sq is None:
        c_sq = sq_norms(c)
    cross = jnp.dot(
        x, c.T,
        precision=_PRECISION if precision is None else precision,
        preferred_element_type=jnp.float32,
    )
    d = x_sq[:, None] - 2.0 * cross + c_sq[None, :]
    # The expansion can go epsilon-negative from cancellation; distances are
    # non-negative by definition.
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_chunked(x: jax.Array, c: jax.Array, chunk: int = 16384):
    """Nearest-centroid assignment, tiled over points to bound live memory.

    x: (n, d), c: (k, d) -> (labels int32 (n,), min_sq_dist f32 (n,)).

    The n x k distance matrix is never materialized in full: ``lax.map`` walks
    fixed-size point tiles so peak memory is chunk*k floats. This is the
    TPU analogue of the reference's point-parallel rayon loop
    (/root/reference/src/kmeans.rs:462-470), with the MXU replacing the
    thread pool.
    """
    n, d = x.shape
    c_sq = sq_norms(c)

    n_pad = -(-n // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    tiles = xp.reshape(n_pad // chunk, chunk, d)

    def one_tile(xt):
        dmat = pairwise_sq_l2(xt, c, c_sq=c_sq)
        return jnp.argmin(dmat, axis=1).astype(jnp.int32), jnp.min(dmat, axis=1)

    labels, dists = jax.lax.map(one_tile, tiles)
    return labels.reshape(n_pad)[:n], dists.reshape(n_pad)[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_spill_chunked(
    x: jax.Array,
    c: jax.Array,
    labels: jax.Array,
    soar_lambda=1.0,
    chunk: int = 8192,
):
    """SOAR-style secondary assignment for spilled (multi-assigned) IVF.

    For each point with primary cell ``labels``, picks the secondary cell
    j != primary minimizing

        ||x - c_j||^2 + lambda * <x - c_j, r>^2 / ||r||^2,

    where r = x - c_primary is the primary residual. The second term
    penalizes secondary cells whose residual is PARALLEL to the primary's:
    when quantization error hurts the primary probe it hurts a parallel
    secondary the same way, so an orthogonal spill cell covers the
    complementary failure mode (Sun et al., "SOAR", NeurIPS 2023 — public
    technique). lambda=0 reduces to plain second-nearest. Returns (n,) int32
    secondary labels.

    x: (n, d), c: (k, d), labels: (n,) int32. Tiled over points like
    ``assign_chunked``; two matmuls per tile.
    """
    n, d = x.shape
    k = c.shape[0]
    c_sq = sq_norms(c)
    lam = jnp.float32(soar_lambda)

    n_pad = -(-n // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    lp = jnp.pad(labels.astype(jnp.int32), (0, n_pad - n))
    xtiles = xp.reshape(n_pad // chunk, chunk, d)
    ltiles = lp.reshape(n_pad // chunk, chunk)

    def one_tile(args):
        xt, lt = args
        dmat = pairwise_sq_l2(xt, c, c_sq=c_sq)
        r = xt - c[lt]  # (chunk, d) primary residuals
        r_sq = sq_norms(r)
        # <x - c_j, r> = <x, r> - <c_j, r>
        xr = jnp.sum(xt * r, axis=-1)  # (chunk,)
        rc = jnp.dot(
            r, c.T, precision=_PRECISION, preferred_element_type=jnp.float32
        )  # (chunk, k)
        proj = xr[:, None] - rc
        score = dmat + lam * proj * proj / jnp.maximum(r_sq, 1e-12)[:, None]
        # Exclude the primary cell.
        score = score.at[jnp.arange(xt.shape[0]), lt].set(jnp.inf)
        return jnp.argmin(score, axis=1).astype(jnp.int32)

    labels2 = jax.lax.map(one_tile, (xtiles, ltiles))
    return labels2.reshape(n_pad)[:n]


def euclidean_distance_squared(a: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar pair distance (parity helper; reference src/utils.rs:28-30)."""
    diff = jnp.asarray(a) - jnp.asarray(b)
    return jnp.sum(diff * diff)
