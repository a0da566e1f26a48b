import time, functools, numpy as np, jax, jax.numpy as jnp
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.storage import VectorStore
from vector_indexer_tpu.ops.distance import sq_norms
from vector_indexer_tpu.ops.pallas import block_stream as bs

def bench(fn, label, reps=128, pipe=32):
    out = fn()
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter(); n = 0
    while n < reps:
        for _ in range(pipe):
            out = fn(); n += 1
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label:30s} {dt*1e3:8.3f} ms")
    return dt

g = np.random.default_rng(0)
N, d, nq = 100_000, 128, 1024
centers = g.normal(0, 5.0, (1024, d)).astype(np.float32)
xb = (centers[g.integers(0, 1024, N)] + g.normal(0, 1.0, (N, d))).astype(np.float32)
xq = (centers[g.integers(0, 1024, nq)] + g.normal(0, 1.0, (nq, d))).astype(np.float32)
store = VectorStore(external_ids=np.arange(N, dtype=np.uint64), vectors=xb)
idx = IvfIndex.fit(store, seed=42)
lay = idx.layout
table = idx._stream_table(jnp.bfloat16)
lengths = np.asarray(lay.lengths)
n_probe = 8
t_fixed = bs.per_query_slots(lengths, n_probe)
t_cap = bs.shared_task_cap(lengths, n_probe, nq, t_fixed)
print("t_fixed", t_fixed, "t_cap", t_cap, "nblocks", table.m_pad//bs.CHUNK)

q = jnp.asarray(xq)
c = jnp.asarray(idx.centroids); csq = sq_norms(c)

@jax.jit
def coarse(q):
    dc = sq_norms(q)[:,None] - 2*jnp.dot(q, c.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32) + csq[None,:]
    return jax.lax.approx_min_k(dc, n_probe, recall_target=0.99)[1]
probe = coarse(q)
bench(lambda: coarse(q), "A coarse+probe")

@functools.partial(jax.jit, static_argnames=("t_fixed","t_cap"))
def construct(probe, t_fixed, t_cap):
    sblk0 = table.sblk0[probe]; lens = table.lengths[probe]
    nchunks = -(-lens // bs.CHUNK)
    cum = jnp.cumsum(nchunks, axis=1); cum_prev = cum - nchunks
    s = jnp.arange(t_fixed, dtype=jnp.int32)[None, :]
    blk2d = jnp.zeros((nq, t_fixed), jnp.int32)
    for j in range(probe.shape[1]):
        inseg = (s >= cum_prev[:, j:j+1]) & (s < cum[:, j:j+1])
        blk2d = jnp.where(inseg, sblk0[:, j:j+1] + (s - cum_prev[:, j:j+1]), blk2d)
    valid2d = s < cum[:, -1:]
    npairs = nq * t_fixed
    nblocks = table.m_pad // bs.CHUNK
    key = jnp.where(valid2d, blk2d, nblocks).reshape(-1)
    ordv = jnp.argsort(key, stable=True)
    ks = key[ordv]; qrow_s = jnp.arange(npairs, dtype=jnp.int32)[ordv]
    iota = jnp.arange(npairs, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, iota, 0))
    rank = iota - seg_start
    newtask = ((rank % bs.Q_SHARE) == 0) & (ks < nblocks)
    pos_t = jnp.argsort(jnp.logical_not(newtask), stable=True)[:t_cap]
    n_tasks = jnp.sum(newtask.astype(jnp.int32))
    valid_task = jnp.arange(t_cap, dtype=jnp.int32) < n_tasks
    blk_t = jnp.where(valid_task, ks[pos_t], 0)
    cid_t = table.blk_cid[blk_t]
    pos = pos_t[None,:] + jnp.arange(bs.Q_SHARE, dtype=jnp.int32)[:,None]
    pos_c = jnp.minimum(pos, npairs-1)
    in_task = valid_task[None,:] & (pos < npairs) & (ks[pos_c] == blk_t[None,:])
    qrow_t = jnp.where(in_task, qrow_s[pos_c], nq*t_fixed)
    steps = t_cap // bs.FAN_S
    return (qrow_t.reshape(bs.Q_SHARE, bs.FAN_S, steps).transpose(1,0,2),
            blk_t.reshape(bs.FAN_S, steps), cid_t.reshape(bs.FAN_S, steps), blk2d)

qrow_fan, blk_fan, cid_fan, blk2d = construct(probe, t_fixed, t_cap)
bench(lambda: construct(probe, t_fixed, t_cap), "B construction (sorts)")

q_pad = nq + 8
qall = jnp.pad(q, ((0, q_pad-nq),(0,0)))
kern = lambda: bs._block_stream_shared_call(qall, table.vecs, table.cent, table.norms, qrow_fan, blk_fan, cid_fan, t_fixed=t_fixed, t_cap=t_cap, metric="l2")
plane = kern()
bench(kern, "C shared kernel")

dist_cat = plane[:nq*t_fixed].reshape(nq, t_fixed*bs.CHUNK)
@jax.jit
def select(dist_cat):
    return jax.lax.approx_min_k(dist_cat, 20, recall_target=0.99)
bench(lambda: select(dist_cat), "D select (plane->20)")

dv, ci = select(dist_cat)
@jax.jit
def rerank(q, ci):
    s_sel = jnp.maximum(ci,0) // bs.CHUNK; w = jnp.maximum(ci,0) % bs.CHUNK
    srow = jnp.take_along_axis(blk2d, s_sel, axis=1)*bs.CHUNK + w
    rows = table.to_main[srow]
    cand = lay.vectors[jnp.maximum(rows,0)]
    cross = jnp.einsum("qd,qkd->qk", q, cand, precision=jax.lax.Precision.HIGHEST)
    ex = sq_norms(q)[:,None] - 2*cross + lay.row_norms[jnp.maximum(rows,0)]
    return jax.lax.top_k(-ex, 10)
bench(lambda: rerank(q, ci), "E rerank (gather 20/q)")

# stream1 kernel alone for comparison (t_sub = t_fixed // FAN)
from vector_indexer_tpu.ops.pallas.block_stream import block_stream_search
@functools.partial(jax.jit, static_argnames=())
def s1():
    return block_stream_search(q, table, probe, 20, t_fixed=t_fixed, metric="l2", approx=True)
bench(s1, "F stream1 full (kern+sel)")
print("PROF DONE")
