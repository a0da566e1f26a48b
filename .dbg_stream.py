import numpy as np
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore
d = 64
g = np.random.default_rng(9)
centers = g.normal(0, 8, (80, d)).astype(np.float32)
data = (centers[g.integers(0, 80, 3200)] + g.normal(0, .4, (3200, d))).astype(np.float32)
idx = IvfIndex.fit(VectorStore(external_ids=np.arange(3200, dtype=np.uint64), vectors=data), seed=9)
Ds, Is = idx.search_batch(data[:8], 5, 8, method="stream_shared")
Dg, Ig = idx.search_batch(data[:8], 5, 8, method="gather")
for i in range(8):
    if set(Is[i].tolist()) != set(Ig[i].tolist()):
        print("q", i)
        print("  stream D", np.round(Ds[i], 4), "I", Is[i])
        print("  gather D", np.round(Dg[i], 4), "I", Ig[i])
