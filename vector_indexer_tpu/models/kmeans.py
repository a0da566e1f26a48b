"""K-means trainers: k-means++ init, full-batch Lloyd, mini-batch, hierarchical assign.

Capability parity with /root/reference/src/kmeans.rs, designed TPU-first:

* assignment = tiled ``||x||^2 - 2 x C^T + ||c||^2`` matmuls (MXU), never a
  per-point scalar loop (reference: find_nearest_centroid + rayon,
  kmeans.rs:355-470);
* centroid update = one-hot matmul partial sums fused into the same tile
  scan (reference: update_centroids_parallel, kmeans.rs:674-719);
* mini-batch update keeps the reference's per-cluster learning rate
  ``eta = 1/count`` with count incremented once per batch hit
  (kmeans.rs:729-787), vectorized over all k clusters at once;
* the whole training loop runs on-device under ``lax.while_loop`` with an
  RMS-delta early stop (sqrt(sum((c-p)^2)/(k*d)) < 1e-4, kmeans.rs:334-351);
* empty clusters are re-seeded from random data points every iteration
  (kmeans.rs:313-331);
* k-means++ init is exact below 50k points and subsampled above
  (kmeans.rs:154-310), with deterministic jax.random keys replacing StdRng.
* hierarchical (two-level) assignment for very large k mirrors
  kmeans.rs:474-648 (meta_k = clamp(sqrt(k), 2, k/2), 5 Lloyd iterations on
  the centroids with derived seed ``seed*17+42``, top-3 meta probe).

Determinism: bit-reproducible given (data, params, seed); sequences differ
from the reference's StdRng, so statistical invariants (inertia, recall) are
the cross-implementation contract, as in the reference's own stability tests.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import pairwise_sq_l2, sq_norms
from ..utils.heuristics import mini_batch_size

_SAMPLE_THRESHOLD = 50_000  # exact vs sampled k-means++ switch (kmeans.rs:158)
_DEFAULT_TOL = 1e-4
_ASSIGN_CHUNK = 8192
# Dense distance matmul rides the MXU; two-level assignment only pays off for
# very large centroid tables. (The reference flips at k>100 because its dense
# path is scalar-SIMD; on TPU that would be a pessimization.)
_HIERARCHICAL_K_THRESHOLD = 8192


@dataclasses.dataclass
class KMeansResult:
    centroids: jax.Array  # (k, d) f32
    labels: jax.Array  # (n,) int32
    iterations: int
    converged: bool


def _check_data(data) -> jax.Array:
    data = jnp.asarray(data, dtype=jnp.float32)
    if data.ndim != 2 or data.shape[0] == 0 or data.shape[1] == 0:
        raise ValueError("Input vectors cannot be empty")
    return data


# ---------------------------------------------------------------------------
# k-means++ initialization
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "draw_block"))
def _kmeans_pp_exact(key, data: jax.Array, k: int, draw_block: int = 1) -> jax.Array:
    """k-means++ on-device: fori_loop over D^2-weighted draws.

    ``draw_block`` > 1 draws B centers per step (Gumbel top-B over the D^2
    weights, i.e. a without-replacement batch whose weights are only updated
    between blocks) — the batched-greedy k-means++ variant. Sequential exact
    (B=1) needs k dependent steps, hostile to a 4000-cluster init on any
    accelerator; B=64 cuts the critical path 64x with negligible quality
    loss (the stability/recovery tests are the contract).
    """
    n, d = data.shape
    key0, key_first = jax.random.split(key)
    first = jax.random.randint(key_first, (), 0, n)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(data[first])

    x_sq = sq_norms(data)

    def dist_to_block(cblk):
        # (n,) min squared distance to any of the B new centroids.
        cross = jnp.dot(
            data, cblk.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (n, B)
        dd = x_sq[:, None] - 2.0 * cross + jnp.sum(cblk * cblk, axis=1)[None, :]
        return jnp.maximum(jnp.min(dd, axis=1), 0.0)

    min_d0 = dist_to_block(data[first][None, :])
    num_blocks = -(-(k - 1) // draw_block)

    def body(i, carry):
        centroids, min_d = carry
        ki = jax.random.fold_in(key0, i)
        total = jnp.sum(min_d)
        # D^2-weighted without-replacement block draw: Gumbel top-B on log
        # weights; all-zero weights (identical points) degrade to uniform.
        logits = jnp.where(min_d > 0, jnp.log(jnp.maximum(min_d, 1e-30)), -jnp.inf)
        logits = jnp.where(total > 0, logits, jnp.zeros_like(logits))
        gumbel = jax.random.gumbel(ki, (n,))
        _, idx = jax.lax.top_k(logits + gumbel, draw_block)
        cblk = data[idx]  # (B, d)
        start = 1 + i * draw_block
        centroids = jax.lax.dynamic_update_slice(centroids, cblk, (start, 0))
        min_d = jnp.minimum(min_d, dist_to_block(cblk))
        return centroids, min_d

    centroids, _ = jax.lax.fori_loop(0, num_blocks, body, (centroids0, min_d0))
    # dynamic_update_slice clamps at the tail: the final block may overwrite
    # rows before k; rows [k_pad_tail] stay consistent because start is
    # clamped to k - draw_block, rewriting some rows with valid draws.
    return centroids[:k]


def kmeans_plus_plus_init(
    data,
    k: int,
    seed: int = 42,
    sample_threshold: int = _SAMPLE_THRESHOLD,
) -> jax.Array:
    """k-means++ seeding; subsampled above ``sample_threshold`` points.

    Parity: kmeans_plus_plus_init dispatch (kmeans.rs:154-164), exact
    (kmeans.rs:167-228, incl. the k>=n duplication path :216-225), sampled
    (kmeans.rs:232-310).
    """
    data = _check_data(data)
    n = data.shape[0]
    key = jax.random.PRNGKey(seed)

    if k >= n:
        # Every point becomes a centroid; surplus centroids cycle through the
        # points again (empty-cluster repair owns them during training).
        idx = jnp.arange(k) % n
        return data[idx]

    if n > sample_threshold:
        key, sub = jax.random.split(key)
        pick = jax.random.choice(sub, n, (sample_threshold,), replace=False)
        data = data[pick]
        n = sample_threshold

    # Sequential exact draws for small k; batched-greedy blocks for large k
    # (the init would otherwise serialize k dependent device steps).
    if k <= 128:
        draw_block = 1
    else:
        draw_block = max(1, min(64, k - 1, n))
    return _kmeans_pp_exact(key, data, k, draw_block=draw_block)


# ---------------------------------------------------------------------------
# Assignment
# ---------------------------------------------------------------------------


def _pad_tiles(x: jax.Array, chunk: int):
    n, d = x.shape
    n_pad = -(-n // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return xp.reshape(n_pad // chunk, chunk, d), n_pad


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_dense(data: jax.Array, centroids: jax.Array, chunk: int = _ASSIGN_CHUNK):
    n, _ = data.shape
    c_sq = sq_norms(centroids)
    tiles, _ = _pad_tiles(data, chunk)

    def one(xt):
        dmat = pairwise_sq_l2(xt, centroids, c_sq=c_sq)
        return jnp.argmin(dmat, axis=1).astype(jnp.int32), jnp.min(dmat, axis=1)

    labels, dists = jax.lax.map(one, tiles)
    return labels.reshape(-1)[:n], dists.reshape(-1)[:n]


def assign_points(data, centroids, method: str = "auto", chunk: int = _ASSIGN_CHUNK):
    """labels, sq_dists = nearest centroid per point.

    ``auto`` uses the dense MXU path unless k is very large, in which case the
    two-level candidate short-list is cheaper (reference flips at k>100,
    kmeans.rs:445-459; on the MXU the crossover is orders of magnitude later).
    ``pallas`` dispatches the fused assign kernel (distance tiles stay in
    VMEM; zero HBM traffic for the (n, k) matrix) — profitable for large n*k
    on a real TPU backend.
    """
    data = jnp.asarray(data, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    k = centroids.shape[0]
    if method == "auto":
        if k > _HIERARCHICAL_K_THRESHOLD:
            method = "hierarchical"
        else:
            # Fused Pallas assignment when the (n, k) distance plane is big
            # enough for the in-VMEM fold to pay (measured 4.6x over the XLA
            # path at n=1M, k=4000 on v5e, bit-identical argmins at HIGHEST
            # precision); XLA path on CPU/interpret and small problems.
            from ..ops.pallas.assign import pallas_supported

            big = data.shape[0] * k >= (1 << 26) and k >= 512
            method = "pallas" if (big and pallas_supported()) else "dense"
    if method == "dense":
        return _assign_dense(data, centroids, chunk=chunk)
    if method == "pallas":
        from ..ops.pallas.assign import assign_argmin_pallas

        return assign_argmin_pallas(data, centroids)
    if method == "hierarchical":
        return assign_points_hierarchical(data, centroids, chunk=chunk)
    raise ValueError(f"unknown assignment method: {method}")


def assign_points_hierarchical(
    data,
    centroids,
    seed: int = 42,
    probes: int = 3,
    chunk: int = _ASSIGN_CHUNK,
):
    """Two-level assignment: meta-centroid probe then masked candidate argmin.

    Parity with assign_points_hierarchical / build_centroid_hierarchy
    (kmeans.rs:474-648): meta_k = clamp(sqrt(k), 2, k/2); the meta clustering
    is 5 Lloyd iterations over the centroid table with derived seed
    ``seed*17+42``; each point probes its top-3 meta centroids and argmins
    over their member centroids only.
    """
    data = jnp.asarray(data, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    n, d = data.shape
    k = centroids.shape[0]
    meta_k = max(2, min(int(math.sqrt(k)), k // 2))
    probes = min(probes, meta_k)

    # 5 Lloyd iterations on the centroids themselves.
    meta = run_kmeans_lloyd(
        centroids, meta_k, max_iters=5, seed=seed * 17 + 42, early_stop_threshold=0.0
    )
    meta_centroids = meta.centroids
    meta_labels = np.asarray(meta.labels)

    # Padded group table (meta_k, g_max) of centroid ids, -1 = hole. Built on
    # host: this is a build-time data-dependent shape.
    counts = np.bincount(meta_labels, minlength=meta_k)
    g_max = max(1, int(counts.max()))
    table = np.full((meta_k, g_max), -1, dtype=np.int32)
    fill = np.zeros(meta_k, dtype=np.int64)
    for cid, m in enumerate(meta_labels):
        table[m, fill[m]] = cid
        fill[m] += 1
    table = jnp.asarray(table)

    # Bound the per-tile candidate gather (chunk, probes*g_max, d): meta
    # groups are skewed (5-iter meta Lloyd leaves whales — measured
    # g_max/mean ~6x at k=12.6k), and the gather materializes twice in the
    # lowered map body. An unbounded chunk OOM'd at n=10M k=12652
    # (2 x 7.7 GiB tiles); cap the pair at ~2 GiB and round the chunk to
    # the sublane tile.
    tile_bytes = 2 * chunk * probes * g_max * d * 4
    cap = 2 << 30
    if tile_bytes > cap:
        chunk = max(256, (cap // (2 * probes * g_max * d * 4)) // 256 * 256)

    return _assign_hierarchical_jit(
        data, centroids, meta_centroids, table, probes=probes, chunk=chunk
    )


@functools.partial(jax.jit, static_argnames=("probes", "chunk"))
def _assign_hierarchical_jit(data, centroids, meta_centroids, table, probes, chunk):
    n, d = data.shape
    c_sq = sq_norms(centroids)
    m_sq = sq_norms(meta_centroids)
    g_max = table.shape[1]
    tiles, _ = _pad_tiles(data, chunk)

    def one(xt):
        dmeta = pairwise_sq_l2(xt, meta_centroids, c_sq=m_sq)  # (chunk, meta_k)
        _, top_meta = jax.lax.top_k(-dmeta, probes)  # (chunk, probes)
        cand = table[top_meta].reshape(chunk, probes * g_max)  # (chunk, P)
        valid = cand >= 0
        cand_safe = jnp.where(valid, cand, 0)
        cvecs = centroids[cand_safe]  # (chunk, P, d) gather
        cross = jnp.einsum(
            "cd,cpd->cp", xt, cvecs, precision=jax.lax.Precision.HIGHEST
        )
        dist = sq_norms(xt)[:, None] - 2.0 * cross + c_sq[cand_safe]
        dist = jnp.where(valid, jnp.maximum(dist, 0.0), jnp.inf)
        best = jnp.argmin(dist, axis=1)
        lbl = jnp.take_along_axis(cand_safe, best[:, None], axis=1)[:, 0]
        bd = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
        return lbl.astype(jnp.int32), bd

    labels, dists = jax.lax.map(one, tiles)
    return labels.reshape(-1)[:n], dists.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Shared update pieces
# ---------------------------------------------------------------------------


def _segment_stats(x: jax.Array, labels: jax.Array, k: int, valid=None):
    """(sums (k,d), counts (k,)) via one-hot matmul — MXU-friendly scatter-add."""
    oh = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    if valid is not None:
        oh = oh * valid[:, None]
    sums = jnp.dot(oh.T, x, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    counts = jnp.sum(oh, axis=0)
    return sums, counts


def _repair_empty(key, centroids: jax.Array, counts: jax.Array, data: jax.Array):
    """Re-seed zero-count clusters from random data points (kmeans.rs:313-331)."""
    k = centroids.shape[0]
    n = data.shape[0]
    ridx = jax.random.randint(key, (k,), 0, n)
    repl = data[ridx]
    empty = (counts == 0)[:, None]
    return jnp.where(empty, repl, centroids)


def _rms_delta(curr: jax.Array, prev: jax.Array) -> jax.Array:
    k, d = curr.shape
    return jnp.sqrt(jnp.sum((curr - prev) ** 2) / (k * d))


# ---------------------------------------------------------------------------
# Full-batch Lloyd
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_iters", "chunk", "spherical", "fast_iters"),
)
def _lloyd_loop(data, init_centroids, key, k, max_iters, tol, chunk,
                spherical=False, fast_iters=False):
    n, d = data.shape
    tiles, n_pad = _pad_tiles(data, chunk)
    num_tiles = n_pad // chunk
    row_iota = jnp.arange(chunk)
    # Training-iteration assignment MAY run single-pass (bf16 inputs, f32
    # accumulation): boundary points near argmin ties flip, which barely
    # moves the means, and the FINAL assignment (posting lists) is computed
    # exactly outside this loop. Measured A/B at n=1M, k=4000 on v5e: the
    # loop is NOT matmul-bound (exact and fast both ~5s for 20 iterations;
    # the apparent slowness of first runs is the lazy 512 MB h2d), so the
    # default stays exact; the option is kept for matmul-bound shapes.
    iter_prec = (
        jax.lax.Precision.DEFAULT if fast_iters else jax.lax.Precision.HIGHEST
    )

    def stats(centroids):
        c_sq = sq_norms(centroids)

        def step(carry, inp):
            sums, counts = carry
            xt, start = inp
            dmat = pairwise_sq_l2(xt, centroids, c_sq=c_sq,
                                  precision=iter_prec)
            lbl = jnp.argmin(dmat, axis=1).astype(jnp.int32)
            valid = ((start + row_iota) < n).astype(jnp.float32)
            s, c = _segment_stats(xt, lbl, k, valid=valid)
            return (sums + s, counts + c), None

        starts = jnp.arange(num_tiles) * chunk
        (sums, counts), _ = jax.lax.scan(
            step, (jnp.zeros((k, d)), jnp.zeros(k)), (tiles, starts)
        )
        return sums, counts

    def cond(carry):
        _, _, it, delta, _ = carry
        return jnp.logical_and(it < max_iters, delta >= tol)

    def body(carry):
        centroids, key, it, _, _ = carry
        key, krep = jax.random.split(key)
        sums, counts = stats(centroids)
        new_c = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        new_c = _repair_empty(krep, new_c, counts, data)
        if spherical:
            # Spherical k-means: centroids live on the unit sphere, so
            # L2 assignment == cosine assignment for unit data.
            new_c = new_c / jnp.maximum(
                jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12
            )
        delta = _rms_delta(new_c, centroids)
        return new_c, key, it + 1, delta, delta < tol

    init = (init_centroids, key, jnp.int32(0), jnp.float32(jnp.inf), False)
    centroids, _, iters, _, converged = jax.lax.while_loop(cond, body, init)
    return centroids, iters, converged


def run_kmeans_lloyd(
    data,
    k: int,
    max_iters: int,
    early_stop_threshold: Optional[float] = _DEFAULT_TOL,
    seed: int = 42,
    chunk: int = _ASSIGN_CHUNK,
    spherical: bool = False,
    fast_iters: bool = False,
) -> KMeansResult:
    """Full-batch Lloyd (parity: run_kmeans_parallel, kmeans.rs:15-60).

    ``spherical=True`` renormalizes centroids each step (cosine builds).
    ``fast_iters`` runs the per-iteration assignment single-pass (bf16
    inputs); the final labels are always computed exactly."""
    data = _check_data(data)
    tol = _DEFAULT_TOL if early_stop_threshold is None else early_stop_threshold
    init = kmeans_plus_plus_init(data, k, seed=seed)
    key = jax.random.PRNGKey(np.uint32(seed ^ 0x5EED))
    chunk = min(chunk, max(8, data.shape[0]))
    centroids, iters, converged = _lloyd_loop(
        data, init, key, k, max_iters, jnp.float32(tol), chunk,
        spherical=spherical, fast_iters=fast_iters,
    )
    labels, _ = assign_points(data, centroids, chunk=chunk)
    return KMeansResult(centroids, labels, int(iters), bool(converged))


def run_kmeans_lloyd_sampled(
    data,
    k: int,
    max_iters: int,
    train_sample: int,
    seed: int = 42,
    chunk: int = _ASSIGN_CHUNK,
    spherical: bool = False,
) -> KMeansResult:
    """Lloyd trained on a seeded subsample; labels assigned to ALL points.

    faiss-style capacity split (bench_all_ivf.py caps training at
    max_train_points; faiss Clustering subsamples to 256*k): past
    ~O(100) points per centroid, extra training data moves centroids
    negligibly while multiplying every training sweep by n/sample. The
    subsample is drawn without replacement from a generator seeded by
    ``seed`` (deterministic, order-independent); the final full-corpus
    assignment is exact and identical in cost to the unsampled path's
    last step.
    """
    data = _check_data(data)
    n = data.shape[0]
    if train_sample >= n:
        return run_kmeans_lloyd(
            data, k, max_iters, seed=seed, chunk=chunk, spherical=spherical
        )
    if train_sample < k:
        raise ValueError(
            f"train_sample={train_sample} must be >= k={k} centroids"
        )
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0x5A3B1E))
    sel = np.sort(rng.choice(n, size=train_sample, replace=False))
    sub = jnp.take(jnp.asarray(data), jnp.asarray(sel), axis=0)
    res = run_kmeans_lloyd(
        sub, k, max_iters, seed=seed, chunk=chunk, spherical=spherical
    )
    labels, _ = assign_points(data, res.centroids, chunk=chunk)
    return KMeansResult(
        res.centroids, labels, res.iterations, res.converged
    )


def assign_points_host_chunked(
    data_host: np.ndarray,
    centroids,
    chunk_rows: int = 1 << 20,
    method: str = "auto",
) -> np.ndarray:
    """Full-corpus assignment for a HOST-resident corpus: rows are staged
    h2d in fixed ``chunk_rows`` slices (the device never holds more than
    one slice + the centroid table), assigned with the same
    ``assign_points`` the staged path uses, and labels fetched back (4
    B/row d2h). The tail slice is zero-padded to ``chunk_rows`` so every
    chunk shares ONE compiled program (remote compiles are 3-300 s here).

    This is the low-HBM half of ``IvfIndex.fit(resident='host')``: device
    peak = chunk (512 MB at d=128) + assignment tiles, instead of the
    device-resident fit's whole-corpus + packed-table peak that faulted
    the shared v5e at n=10M (~10+ GiB live)."""
    cent_dev = jnp.asarray(centroids, jnp.float32)
    n, d = data_host.shape
    chunk_rows = min(chunk_rows, max(8, n))
    out = np.empty(n, np.int32)
    buf = np.zeros((chunk_rows, d), np.float32)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        buf[: hi - lo] = data_host[lo:hi]
        if hi - lo < chunk_rows:
            buf[hi - lo :] = 0.0
        lbl, _ = assign_points(jnp.asarray(buf), cent_dev, method=method)
        out[lo:hi] = np.asarray(lbl)[: hi - lo]
    return out


def run_kmeans_lloyd_host(
    data_host: np.ndarray,
    k: int,
    max_iters: int,
    train_sample: int,
    seed: int = 42,
    chunk: int = _ASSIGN_CHUNK,
    spherical: bool = False,
    chunk_rows: int = 1 << 20,
) -> KMeansResult:
    """Host-corpus twin of ``run_kmeans_lloyd_sampled``: ONLY the seeded
    training subsample is staged to the device (same generator/seed as the
    sampled trainer, so the trained centroids match it bit-for-bit given
    one backend); the final exact full-corpus assignment runs through
    ``assign_points_host_chunked``. Labels come back as a host array."""
    n = data_host.shape[0]
    train_sample = min(train_sample, n)
    if train_sample < k:
        raise ValueError(
            f"train_sample={train_sample} must be >= k={k} centroids"
        )
    if train_sample < n:
        rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0x5A3B1E))
        sel = np.sort(rng.choice(n, size=train_sample, replace=False))
        sub = data_host[sel]
    else:
        sub = data_host
    res = run_kmeans_lloyd(
        jnp.asarray(sub, jnp.float32), k, max_iters, seed=seed, chunk=chunk,
        spherical=spherical,
    )
    centroids = np.asarray(res.centroids)
    labels = assign_points_host_chunked(
        data_host, centroids, chunk_rows=chunk_rows
    )
    return KMeansResult(centroids, labels, res.iterations, res.converged)


# ---------------------------------------------------------------------------
# Balanced Lloyd (capacity-penalized assignment)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_dense_biased(
    data: jax.Array, centroids: jax.Array, bias: jax.Array,
    chunk: int = _ASSIGN_CHUNK,
):
    """Nearest centroid under an additive per-cluster bias (distance-sq
    units). Returns (labels, TRUE squared distance to the chosen cell)."""
    n, _ = data.shape
    c_sq = sq_norms(centroids)
    tiles, _ = _pad_tiles(data, chunk)

    def one(xt):
        dmat = pairwise_sq_l2(xt, centroids, c_sq=c_sq)
        lbl = jnp.argmin(dmat + bias[None, :], axis=1).astype(jnp.int32)
        return lbl, jnp.take_along_axis(dmat, lbl[:, None], axis=1)[:, 0]

    labels, dists = jax.lax.map(one, tiles)
    return labels.reshape(-1)[:n], dists.reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("k", "max_iters", "chunk", "spherical")
)
def _lloyd_loop_balanced(data, init_centroids, key, k, max_iters, tol, chunk,
                         balance, spherical=False):
    """Lloyd with an occupancy-penalized assignment: each pass adds
    ``pen_c = balance * E * (count_c / target - 1)`` to cell c's distances,
    where E is the previous pass's mean squared quantization error and
    target = n/k. The penalty is in distance-sq units and self-scales with
    the data, so over-full cells shed their boundary points to
    under-full neighbours (an auction-style soft capacity constraint) —
    a fully batched extra broadcast-add per tile, nothing sequential."""
    n, d = data.shape
    tiles, n_pad = _pad_tiles(data, chunk)
    num_tiles = n_pad // chunk
    row_iota = jnp.arange(chunk)
    target = jnp.float32(n) / k

    def stats(centroids, pen):
        c_sq = sq_norms(centroids)

        def step(carry, inp):
            sums, counts, errs, msum = carry
            xt, start = inp
            dmat = pairwise_sq_l2(
                xt, centroids, c_sq=c_sq,
                precision=jax.lax.Precision.HIGHEST,
            )
            lbl = jnp.argmin(dmat + pen[None, :], axis=1).astype(jnp.int32)
            valid = ((start + row_iota) < n).astype(jnp.float32)
            s, c = _segment_stats(xt, lbl, k, valid=valid)
            dsel = jnp.maximum(
                jnp.take_along_axis(dmat, lbl[:, None], axis=1)[:, 0], 0.0
            )
            oh = jax.nn.one_hot(lbl, k, dtype=jnp.float32)
            e = jnp.dot(oh.T, dsel * valid)  # per-cell error sums
            # Assignment margin (2nd-nearest minus nearest, raw geometry):
            # the natural unit for occupancy penalties. In high dimension
            # margins are FAR smaller than the absolute error level E
            # (distance concentration), so E-scaled penalties drown the
            # geometry — measured max/mean 148x at d=128 while the same
            # controller held 1.03 at d=16.
            v2 = jax.lax.top_k(-dmat, 2)[0]
            msum = msum + jnp.sum((v2[:, 0] - v2[:, 1]) * valid)
            return (sums + s, counts + c, errs + e, msum), None

        starts = jnp.arange(num_tiles) * chunk
        (sums, counts, errs, msum), _ = jax.lax.scan(
            step,
            (jnp.zeros((k, d)), jnp.zeros(k), jnp.zeros(k),
             jnp.float32(0.0)),
            (tiles, starts),
        )
        return sums, counts, errs, msum / n

    def cond(carry):
        _, _, _, it, delta, _ = carry
        return jnp.logical_and(it < max_iters, delta >= tol)

    def body(carry):
        centroids, pen, key, it, _, _ = carry
        key, krep = jax.random.split(key)
        sums, counts, errs, margin = stats(centroids, pen)
        err = jnp.sum(errs) / n
        new_c = jnp.where(
            (counts > 0)[:, None],
            sums / jnp.maximum(counts, 1.0)[:, None],
            centroids,
        )
        new_c = _repair_empty(krep, new_c, counts, data)
        if spherical:
            new_c = new_c / jnp.maximum(
                jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12
            )
        # Integral controller: accumulate a damped occupancy correction
        # instead of re-deriving the penalty from scratch (a proportional
        # penalty oscillates — an overfull cell overshoots to empty and
        # back, measured max/mean WORSE than plain Lloyd). Anti-windup:
        # the per-step push is clipped to +-1 target-fraction and the
        # accumulated penalty to +-2E, so penalties nudge boundary points
        # without ever dominating the geometry (unclamped, balance=2
        # measured max/mean 13.7 — penalty-driven chaos). Mean-centering
        # keeps magnitudes bounded (only penalty differences matter).
        push = jnp.clip(counts / target - 1.0, -1.0, 1.0)
        # Integrator in MARGIN units: one step moves at most the points
        # within ~half a mean margin of their boundary; the accumulated
        # penalty is capped at 4 margins (anti-windup — an E-scaled cap
        # let penalties dominate the geometry in high dimension). Gain
        # saturates at 1: larger balance only tightens the split
        # thresholds' effect, not the integrator (E-scaled gain 2x the
        # stable point measured penalty-driven chaos).
        gain = 0.5 * jnp.minimum(balance, 1.0) * margin
        new_pen = pen + gain * push
        new_pen = new_pen - jnp.mean(new_pen)
        new_pen = jnp.clip(new_pen, -4.0 * margin, 4.0 * margin)
        # Clone-split: penalties cannot break up a point mass (its members
        # are equidistant and leave a cell as one bloc, oscillating). When
        # the heaviest cell holds >2x target, clone its centroid onto the
        # lightest cell with a small jitter — the next Lloyd pass splits
        # the mass between the co-located pair. One split per iteration
        # turns a 16x point-mass cell into ~target cells in ~log rounds.
        heavy = jnp.argmax(counts)
        light = jnp.argmin(counts)
        key, kj = jax.random.split(key)
        # Jitter at 10% of the DONOR cell's RMS radius: the clone must land
        # inside the mass it is meant to split (a global-error-scaled
        # jitter overshot tight blobs entirely — the clone stayed empty and
        # was re-donated forever).
        cell_rms = jnp.sqrt(
            errs[heavy] / jnp.maximum(counts[heavy], 1.0)
        )
        jitter = 0.1 * jnp.maximum(cell_rms, 1e-15) * jax.random.normal(
            kj, (d,)
        ) / jnp.sqrt(jnp.float32(d))
        # Split only when there is BOTH a genuinely overfull donor and a
        # genuinely underfull recipient (cloning onto a healthy cell
        # destroys it — measured cascade on already-balanced data), and
        # not in the last iterations (a just-made clone needs a few Lloyd
        # passes to take its share).
        do_split = (
            (counts[heavy] > 2.0 * target)
            & (counts[light] < 0.6 * target)
            & (it < max_iters - 5)
        )
        rows = jnp.arange(k)
        clone = jnp.where(
            (rows == light)[:, None], new_c[heavy][None, :] + jitter[None, :],
            new_c,
        )
        new_c = jnp.where(do_split, clone, new_c)
        new_pen = jnp.where(
            do_split & (rows == light), new_pen[heavy], new_pen
        )
        delta = _rms_delta(new_c, centroids)
        return new_c, new_pen, key, it + 1, delta, delta < tol

    init = (
        init_centroids, jnp.zeros(k, jnp.float32), key, jnp.int32(0),
        jnp.float32(jnp.inf), False,
    )
    centroids, pen, _, iters, _, converged = jax.lax.while_loop(
        cond, body, init
    )
    return centroids, pen, iters, converged


def run_kmeans_balanced(
    data,
    k: int,
    max_iters: int,
    balance: float = 1.0,
    early_stop_threshold: Optional[float] = None,
    seed: int = 42,
    chunk: int = _ASSIGN_CHUNK,
    spherical: bool = False,
) -> KMeansResult:
    """Capacity-penalized full-batch Lloyd: bounds posting-list skew by
    construction (beyond-reference capability — the reference's recall
    depends on skewed cells, kmeans.rs:64-150; here balance is an OPTION
    so tail cells stop dictating gather budgets / stream slot counts /
    per-shard load imbalance).

    The FINAL assignment applies the trained penalty vector too — an
    unpenalized final pass would immediately restore the skew. Returned
    distances are the TRUE squared distances of the (penalized) choice.
    Early stopping is OFF by default: the occupancy integrator keeps
    working after the centroids settle, so the RMS-delta criterion would
    cut the balancing short."""
    data = _check_data(data)
    tol = 0.0 if early_stop_threshold is None else early_stop_threshold
    init = kmeans_plus_plus_init(data, k, seed=seed)
    key = jax.random.PRNGKey(np.uint32(seed ^ 0x5EED))
    chunk = min(chunk, max(8, data.shape[0]))
    centroids, pen, iters, converged = _lloyd_loop_balanced(
        data, init, key, k, max_iters, jnp.float32(tol), chunk,
        jnp.float32(balance), spherical=spherical,
    )
    labels, _ = _assign_dense_biased(
        jnp.asarray(data, jnp.float32), centroids, pen, chunk=chunk
    )
    return KMeansResult(centroids, labels, int(iters), bool(converged))


# ---------------------------------------------------------------------------
# Mini-batch
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "max_iters", "batch_size", "spherical")
)
def _mini_batch_loop(data, init_centroids, key, k, max_iters, tol, batch_size,
                     spherical=False):
    n, d = data.shape

    def cond(carry):
        _, _, _, it, delta, _ = carry
        return jnp.logical_and(it < max_iters, delta >= tol)

    def body(carry):
        centroids, cluster_counts, key, it, _, _ = carry
        key, ksamp, krep = jax.random.split(key, 3)

        # Sample the batch (sample_batch, kmeans.rs:722-726). Strict
        # without-replacement needs an O(n) permutation per iteration; when
        # the corpus dwarfs the batch, collisions are negligible and plain
        # randint draws keep the step O(batch).
        if n >= 16 * batch_size:
            idx = jax.random.randint(ksamp, (batch_size,), 0, n)
        else:
            idx = jax.random.choice(ksamp, n, (batch_size,), replace=False)
        batch = data[idx]

        dmat = pairwise_sq_l2(batch, centroids)
        lbl = jnp.argmin(dmat, axis=1).astype(jnp.int32)
        sums, bcounts = _segment_stats(batch, lbl, k)

        # Per-cluster LR: count bumps once per batch hit; eta = 1/new_count;
        # c <- (1-eta) c + eta * batch_mean  (kmeans.rs:756-773).
        hit = bcounts > 0
        new_counts = cluster_counts + hit.astype(jnp.float32)
        eta = jnp.where(hit, 1.0 / jnp.maximum(new_counts, 1.0), 0.0)[:, None]
        mean = sums / jnp.maximum(bcounts, 1.0)[:, None]
        new_c = jnp.where(hit[:, None], (1.0 - eta) * centroids + eta * mean, centroids)

        new_c = _repair_empty(krep, new_c, new_counts, data)
        if spherical:
            new_c = new_c / jnp.maximum(
                jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12
            )
        delta = _rms_delta(new_c, centroids)
        return new_c, new_counts, key, it + 1, delta, delta < tol

    init = (
        init_centroids,
        jnp.zeros(k, jnp.float32),
        key,
        jnp.int32(0),
        jnp.float32(jnp.inf),
        False,
    )
    centroids, _, _, iters, _, converged = jax.lax.while_loop(cond, body, init)
    return centroids, iters, converged


def run_kmeans_mini_batch(
    data,
    k: int,
    max_iters: int,
    early_stop_threshold: Optional[float] = _DEFAULT_TOL,
    seed: int = 42,
    batch_size: Optional[int] = None,
    chunk: int = _ASSIGN_CHUNK,
    refine_iters: int = 0,
    spherical: bool = False,
) -> KMeansResult:
    """Mini-batch k-means (parity: run_kmeans_mini_batch, kmeans.rs:64-150).

    Defaults keep the reference's operating point (batch = clamp(sqrt(n), 10,
    256)); on TPU a larger batch is nearly free and converges in fewer
    iterations, so builders may pass ``batch_size`` explicitly.

    ``refine_iters`` > 0 appends full-batch Lloyd steps after the mini-batch
    phase. Mini-batch alone leaves heavily skewed cluster sizes (rarely-hit
    clusters barely move); a couple of Lloyd sweeps — nearly free on the MXU
    — rebalance posting lists, which improves IVF recall-per-probe and bounds
    the candidate-gather budgets.
    """
    data = _check_data(data)
    n = data.shape[0]
    tol = _DEFAULT_TOL if early_stop_threshold is None else early_stop_threshold
    if batch_size is None:
        batch_size = mini_batch_size(n)
    batch_size = min(batch_size, n)

    init = kmeans_plus_plus_init(data, k, seed=seed)
    key = jax.random.PRNGKey(np.uint32(seed ^ 0xB47C4))
    centroids, iters, converged = _mini_batch_loop(
        data, init, key, k, max_iters, jnp.float32(tol), batch_size,
        spherical=spherical,
    )
    chunk = min(chunk, max(8, n))
    if refine_iters > 0:
        key2 = jax.random.PRNGKey(np.uint32(seed ^ 0x5EF1E))
        centroids, _, _ = _lloyd_loop(
            data, centroids, key2, k, refine_iters, jnp.float32(0.0), chunk,
            spherical=spherical,
        )
    labels, _ = assign_points(data, centroids, chunk=chunk)
    return KMeansResult(centroids, labels, int(iters), bool(converged))


# ---------------------------------------------------------------------------
# Quality metrics
# ---------------------------------------------------------------------------


def compute_inertia(data, centroids, labels) -> float:
    """Sum of squared distances of points to their assigned centroid."""
    data = jnp.asarray(data, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    labels = jnp.asarray(labels)
    diff = data - centroids[labels]
    return float(jnp.sum(diff * diff))
