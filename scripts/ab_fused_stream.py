"""A/B the fused-selection block-stream kernel vs the materialized-plane
path on the real chip: same index, same queries, VITPU_FUSED_STREAM=0/1
traced as separate programs, result-set parity after the exact re-rank,
QPS in one time window.

    python scripts/ab_fused_stream.py --n 2000000 --nprobes 4,8,16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--nq", type=int, default=1_024)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--nprobes", default="4,8,16,32")
    p.add_argument("--min-time", type=float, default=3.0)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.datasets import clustered
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.storage import VectorStore

    xb, xq = clustered(args.n, args.d, args.nq, seed=42)

    t0 = time.perf_counter()
    store = VectorStore(
        external_ids=np.arange(args.n, dtype=np.uint64), vectors=xb
    )
    idx = IvfIndex.fit(store, seed=42)
    print(f"# build {time.perf_counter() - t0:.1f}s nlist={idx.num_clusters}",
          file=sys.stderr, flush=True)
    if args.dtype == "int8":
        idx.stream_dtype = jnp.dtype(jnp.int8)
    xq_dev = jax.device_put(jnp.asarray(xq))

    rows = []
    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        res = {}
        for fused in ("0", "1"):
            os.environ["VITPU_FUSED_STREAM"] = fused
            # env is read at trace time; distinct n_probe values trace
            # distinct programs, but the SAME nprobe across fused=0/1 would
            # reuse one jit cache entry — clear between arms.
            jax.clear_caches()
            D, I = idx.search_batch_device(xq_dev, args.k, nprobe,
                                           method="stream")
            D1 = np.asarray(D[:1, :1])  # claim + sync
            t0 = time.perf_counter()
            nrun = 0
            PIPE = 32
            while True:
                for _ in range(PIPE):
                    D, I = idx.search_batch_device(
                        xq_dev, args.k, nprobe, method="stream"
                    )
                _ = np.asarray(D[:1, :1])
                nrun += PIPE
                el = time.perf_counter() - t0
                if el >= args.min_time:
                    break
            res[fused] = dict(
                qps=nrun * args.nq / el,
                I=np.asarray(I), D=np.asarray(D),
            )
        inter = np.mean([
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            / max((a >= 0).sum(), 1)
            for a, b in zip(res["0"]["I"], res["1"]["I"])
        ])
        row = dict(
            nprobe=nprobe,
            qps_unfused=round(res["0"]["qps"], 1),
            qps_fused=round(res["1"]["qps"], 1),
            speedup=round(res["1"]["qps"] / res["0"]["qps"], 3),
            set_intersection=round(float(inter), 5),
        )
        rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr, flush=True)

    os.environ.pop("VITPU_FUSED_STREAM", None)
    out = dict(config=vars(args), rows=rows)
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
