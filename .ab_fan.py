"""A/B the stream kernel FAN constant (run with VIX_FAN=8 / 16)."""
import os, time, numpy as np, jax, jax.numpy as jnp
import vector_indexer_tpu.ops.pallas.block_stream as bs
fan = int(os.environ.get("VIX_FAN", "8"))
bs.FAN = fan
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore

g = np.random.default_rng(0)
N, d = 1_000_000, 128
centers = g.normal(0, 5.0, (1024, d)).astype(np.float32)
xb = (centers[g.integers(0, 1024, N)] + g.normal(0, 1.0, (N, d))).astype(np.float32)
xq = (centers[g.integers(0, 1024, 1024)] + g.normal(0, 1.0, (1024, d))).astype(np.float32)
idx = IvfIndex.fit(VectorStore(external_ids=np.arange(N, dtype=np.uint64), vectors=xb), seed=42)
xq_dev = jnp.asarray(xq)
for nprobe in (4, 8, 16):
    D, _ = idx.search_batch_device(xq_dev, 10, nprobe, method="stream")
    _ = np.asarray(D[:1, :1])
    t0 = time.perf_counter(); n = 0
    while n < 96:
        for _ in range(32):
            D, _ = idx.search_batch_device(xq_dev, 10, nprobe, method="stream")
            n += 1
        _ = np.asarray(D[:1, :1])
    print(f"FAN={fan} nprobe={nprobe}: {(time.perf_counter()-t0)/n*1e3:.2f} ms/kilobatch")
