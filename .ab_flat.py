"""A/B flat bf16-input sweep vs f32, n=100k and 1M, same window.
Env VIX_REV=1 runs the pre-change behavior via flat_exact comparison only."""
import time, numpy as np, jax, jax.numpy as jnp
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore
from vector_indexer_tpu.ops import brute_force_topk

def bench(fn, reps=96, pipe=32):
    out = fn(); _ = np.asarray(out[0][:1, :1])
    t0 = time.perf_counter(); n = 0
    while n < reps:
        for _ in range(pipe):
            out = fn(); n += 1
        _ = np.asarray(out[0][:1, :1])
    return (time.perf_counter() - t0) / n

g = np.random.default_rng(42)
for N in (100_000, 1_000_000):
    xb = g.standard_normal((N, 128), dtype=np.float32)
    xq = g.standard_normal((1024, 128), dtype=np.float32)
    idx = IvfIndex.fit(VectorStore(external_ids=np.arange(N, dtype=np.uint64), vectors=xb), seed=42)
    _, gt = brute_force_topk(jnp.asarray(xq), jnp.asarray(xb), 10)
    gt = np.asarray(gt)
    xq_dev = jnp.asarray(xq)
    for method in ("flat", "flat_exact"):
        D, I = idx.search_batch(xq, 100, idx.num_clusters, method=method)
        r10 = float((I[:, :10] == gt[:, :1]).any(1).mean())
        r1 = float((I[:, :1] == gt[:, :1]).any(1).mean())
        sec = bench(lambda m=method: idx.search_batch_device(xq_dev, 100, idx.num_clusters, method=m))
        print(f"n={N} {method:11s} R@1={r1:.4f} R@10={r10:.4f} {sec*1e3:.2f} ms/kilobatch ({1024/sec:,.0f} qps)")
print("AB FLAT DONE")
