"""Three-arm A/B at the block-major shared kernel's regime (>=48k probed
rows/query, nq>=1024): stream_shared vs the per-query stream with and
without fused selection, one time window. Decides whether the
SHARED_MIN_PROBED_ROWS auto rule (calibrated against the UNFUSED
per-query stream, commit 01628d4) survives the fused kernel.

    python scripts/ab_shared_vs_fused.py --n 2000000 --nprobes 48,64,96
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
    p.add_argument("--nprobes", default="48,64,96")
    p.add_argument("--nlist", type=int, default=0, help="0 = heuristic")
    p.add_argument("--min-time", type=float, default=3.0)
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.datasets import clustered
    from benchmarks.harness import work_accounting
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.storage import VectorStore

    xb, xq = clustered(args.n, args.d, args.nq, seed=42)

    t0 = time.perf_counter()
    store = VectorStore(
        external_ids=np.arange(args.n, dtype=np.uint64), vectors=xb
    )
    idx = IvfIndex.fit(store, seed=42, nlist=args.nlist or None)
    print(f"# build {time.perf_counter() - t0:.1f}s nlist={idx.num_clusters}",
          file=sys.stderr, flush=True)
    xq_dev = jax.device_put(jnp.asarray(xq))

    ARMS = (  # (tag, method, VITPU_FUSED_STREAM)
        ("stream", "stream", "0"),
        ("stream_fused", "stream", "1"),
        ("shared", "stream_shared", None),
    )
    rows = []
    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        acct = work_accounting(idx, xq, nprobe, "stream")
        res = {}
        for tag, method, env in ARMS:
            if env is None:
                os.environ.pop("VITPU_FUSED_STREAM", None)
            else:
                os.environ["VITPU_FUSED_STREAM"] = env
            jax.clear_caches()
            D, I = idx.search_batch_device(xq_dev, args.k, nprobe,
                                           method=method)
            _ = np.asarray(D[:1, :1])
            t0 = time.perf_counter()
            nrun = 0
            PIPE = 32
            while True:
                for _ in range(PIPE):
                    D, I = idx.search_batch_device(
                        xq_dev, args.k, nprobe, method=method
                    )
                _ = np.asarray(D[:1, :1])
                nrun += PIPE
                el = time.perf_counter() - t0
                if el >= args.min_time:
                    break
            res[tag] = dict(qps=nrun * args.nq / el, I=np.asarray(I))
        base = res["stream"]["I"]
        row = dict(
            nprobe=nprobe,
            probed_rows_per_q=round(acct["cand_per_q"], 0),
            **{f"qps_{t}": round(res[t]["qps"], 1) for t, _, _ in ARMS},
        )
        for t in ("stream_fused", "shared"):
            row[f"inter_{t}"] = round(float(np.mean([
                len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
                / max((a >= 0).sum(), 1)
                for a, b in zip(base, res[t]["I"])
            ])), 5)
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
