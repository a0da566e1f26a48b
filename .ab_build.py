"""Build-time A/B: fast_iters bf16 Lloyd vs exact, 1M x 4000, same window."""
import time, numpy as np, jax, jax.numpy as jnp
from vector_indexer_tpu.models.kmeans import run_kmeans_lloyd, compute_inertia

g = np.random.default_rng(0)
centers = g.normal(0, 5.0, (1024, 128)).astype(np.float32)
xb = (centers[g.integers(0, 1024, 1_000_000)] + g.normal(0, 1.0, (1_000_000, 128))).astype(np.float32)
dev = jnp.asarray(xb)
for fast in (False, True):
    # warm compile
    r = run_kmeans_lloyd(dev[:100_000], 4000, 2, seed=1, fast_iters=fast)
    _ = np.asarray(r.labels[:1])
    t0 = time.perf_counter()
    r = run_kmeans_lloyd(dev, 4000, 20, seed=42, fast_iters=fast)
    _ = np.asarray(r.labels[:1])
    dt = time.perf_counter() - t0
    inert = compute_inertia(dev, r.centroids, r.labels)
    print(f"fast_iters={fast}: {dt:.1f}s iters={r.iterations} converged={r.converged} inertia={inert:.4e}")
print("AB BUILD DONE")
