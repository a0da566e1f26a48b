"""Data-parallel Lloyd k-means over a device mesh.

The training-side scaling axis: points are sharded over the mesh, centroids
replicated; each device computes its partial (sums, counts) with the same
fused assign+one-hot-matmul tile scan as the single-chip trainer, and a
``psum`` over ICI reduces the statistics — the collective-based analogue of
the reference's rayon per-thread partial reductions
(/root/reference/src/kmeans.rs:674-719).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.kmeans import KMeansResult, kmeans_plus_plus_init, _rms_delta
from ..ops.distance import pairwise_sq_l2, sq_norms


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "max_iters", "n", "spherical"),
)
def _dp_lloyd(
    mesh, axis, data_sh, valid_sh, init_centroids, key, *, k, max_iters, tol,
    n, spherical=False,
):
    from jax import shard_map

    n_dev = mesh.shape[axis]

    def local_stats(centroids, xloc, vloc):
        dmat = pairwise_sq_l2(xloc, centroids)
        lbl = jnp.argmin(dmat, axis=1)
        oh = jax.nn.one_hot(lbl, k, dtype=jnp.float32) * vloc[:, None]
        sums = jnp.dot(oh.T, xloc, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        counts = jnp.sum(oh, axis=0)
        return sums, counts

    def per_device(xloc, vloc, centroids, key):
        local_n = xloc.shape[0]
        my = jax.lax.axis_index(axis)

        def repair_empty_dp(krep, centroids, counts):
            # Replicated empty-cluster repair: every device draws the SAME
            # global row ids (same key), the owning device contributes the
            # row, and a psum broadcasts it — keeping the replicated
            # centroids bit-identical across the mesh. (Repairing from the
            # device-LOCAL slice with a shared key silently diverged: each
            # device picked a different point, desyncing the while_loop.)
            ridx = jax.random.randint(krep, (k,), 0, n)  # global row space
            own = (ridx // local_n) == my
            rows = xloc[ridx % local_n] * own[:, None].astype(jnp.float32)
            rows = jax.lax.psum(rows, axis)
            empty = (counts == 0)[:, None]
            return jnp.where(empty, rows, centroids)

        def cond(carry):
            _, _, it, delta = carry
            return jnp.logical_and(it < max_iters, delta >= tol)

        def body(carry):
            centroids, key, it, _ = carry
            key, krep = jax.random.split(key)
            sums, counts = local_stats(centroids, xloc, vloc)
            sums = jax.lax.psum(sums, axis)      # ICI all-reduce
            counts = jax.lax.psum(counts, axis)
            new_c = jnp.where(
                (counts > 0)[:, None],
                sums / jnp.maximum(counts, 1.0)[:, None],
                centroids,
            )
            new_c = repair_empty_dp(krep, new_c, counts)
            if spherical:
                new_c = new_c / jnp.maximum(
                    jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12
                )
            delta = _rms_delta(new_c, centroids)
            return new_c, key, it + 1, delta

        centroids, _, it, _ = jax.lax.while_loop(
            cond, body, (centroids, key, jnp.int32(0), jnp.float32(jnp.inf))
        )
        # Final assignment of the local slice.
        dmat = pairwise_sq_l2(xloc, centroids)
        lbl = jnp.argmin(dmat, axis=1).astype(jnp.int32)
        return centroids, lbl, it

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    return fn(data_sh, valid_sh, init_centroids, key)


def run_kmeans_lloyd_dp(
    data,
    k: int,
    max_iters: int,
    mesh: Mesh,
    axis: str = "shards",
    early_stop_threshold: float = 1e-4,
    seed: int = 42,
    spherical: bool = False,
) -> KMeansResult:
    """Data-parallel full-batch Lloyd over ``mesh``; centroids replicated."""
    data = np.ascontiguousarray(data, np.float32)
    n, d = data.shape
    if n == 0:
        raise ValueError("Input vectors cannot be empty")
    n_dev = mesh.shape[axis]
    n_pad = _round_up(n, n_dev * 8)
    dp = np.zeros((n_pad, d), np.float32)
    dp[:n] = data
    valid = np.zeros(n_pad, np.float32)
    valid[:n] = 1.0

    init = kmeans_plus_plus_init(data, k, seed=seed)
    key = jax.random.PRNGKey(np.uint32(seed ^ 0xD9))

    sh = NamedSharding(mesh, P(axis))
    data_sh = jax.device_put(dp, sh)
    valid_sh = jax.device_put(valid, sh)
    centroids, labels, iters = _dp_lloyd(
        mesh, axis, data_sh, valid_sh, init, key,
        k=k, max_iters=max_iters, tol=jnp.float32(early_stop_threshold), n=n,
        spherical=spherical,
    )
    iters = int(iters)
    return KMeansResult(centroids, labels[:n], iters, iters < max_iters)
