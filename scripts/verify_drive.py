"""End-to-end verify drive on the REAL TPU (the /verify skill's recipe).

Runs the public-API index lifecycle (build -> persist -> load ->
search_sync), a stream-path recall check against the brute-force oracle
at both parities of the hoisted re-rank's super-tile grouping, and the
error-contract probes. Exits non-zero on any failure.

    python scripts/verify_drive.py          # real TPU via the axon tunnel
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vector_indexer_tpu as vx  # noqa: E402

g = np.random.default_rng(0)
data = g.normal(size=(50_000, 64)).astype(np.float32)
cfg = (
    vx.VectorIndexerConfig(64)
    .with_index_dir("/tmp/vix_vd/index")
    .with_shards_dir("/tmp/vix_vd/shards")
)
recs = [vx.VectorRecord(i, data[i]) for i in range(len(data))]
print("building...", flush=True)
ix = vx.VectorIndexer(cfg).build_from_records(recs)
print("built", flush=True)
ix2 = vx.VectorIndexer.load(cfg)
res = ix2.search_sync(ix2.search_request(data[7]).with_k(10).with_n_probe(20))
assert res[0].external_id == 7, res[0]
print("self-hit OK")

# Stream path (hoisted re-rank) recall vs the oracle, both parities of
# the super-tile branch (nq=1024 -> rt == nq_pad fast path; nq=8192 ->
# grouped lax.map).
import jax  # noqa: E402

from vector_indexer_tpu.ops import brute_force_topk  # noqa: E402

idx = ix2.index
lay = idx.layout
for nq in (1024, 8192):
    xq = g.normal(size=(nq, 64)).astype(np.float32)
    D, I = idx.search_batch(xq, 10, 20, method="stream")
    _, prows = brute_force_topk(
        jax.device_put(xq), lay.vectors[: lay.rows_used], 10,
        db_row_norms=lay.row_norms[: lay.rows_used],
    )
    gt = lay.perm[np.asarray(prows)].astype(np.int64)
    r10 = float(np.mean(
        [len(set(I[i, :10]) & set(gt[i, :10])) / 10 for i in range(nq)]
    ))
    print(f"stream nq={nq} R@10={r10:.4f}", flush=True)
    assert r10 > 0.93, r10

# Offload rerank='device' (two-layer corrected re-rank, ops/correction.py):
# result-set parity with the exact-host re-rank at the same operating point.
from vector_indexer_tpu.index import load_index_from  # noqa: E402

xq32 = data[:32] + 0.01
offh = load_index_from("/tmp/vix_vd/index", "/tmp/vix_vd/shards",
                       resident="offload", offload_rerank="host")
Dh, Ih = offh.search_batch(xq32, 10, 20)
offd = load_index_from("/tmp/vix_vd/index", "/tmp/vix_vd/shards",
                       resident="offload", offload_rerank="device")
Dd, Id = offd.search_batch(xq32, 10, 20)
ov = float(np.mean([len(set(Ih[i]) & set(Id[i])) / 10 for i in range(32)]))
derr = float(np.abs(np.sort(Dh, 1) - np.sort(Dd, 1)).max())
print(f"offload device-rerank parity: overlap@10={ov:.3f} max|dD|={derr:.2e}")
assert ov >= 0.97 and derr < 2e-2, (ov, derr)

print("probes: dim mismatch / k=0")
try:
    ix2.search_sync(ix2.search_request(np.zeros(32, np.float32)))
    raise SystemExit("no dim error")
except ValueError as e:
    print("dim ValueError OK:", str(e)[:60])
try:
    ix2.search_sync(ix2.search_request(data[0]).with_k(0))
    raise SystemExit("no k error")
except ValueError:
    print("k=0 ValueError OK")
print("VERIFY PASS")
