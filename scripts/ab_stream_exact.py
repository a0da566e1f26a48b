"""Same-window A/B at the stage-2 scale (round-5, after the re-rank
decomposition): is the f32 stream table WITHOUT a re-rank (stream_exact)
faster end-to-end than the bf16 table + exact re-rank (stream), now that
the decomposition showed the re-rank stage costs 8.5-10 us/q — a
5+ MB/q byte-equivalent — while the kernel itself runs at ~bandwidth?

Arms (all through IvfIndex.search_batch_device, production dispatch):
  stream        bf16 residuals + hoisted exact re-rank (2 B/elem sweep)
  stream_exact  f32 residuals, no re-rank (4 B/elem sweep)
  stream int8   int8 residuals + re-rank (1 B/elem, two-pass MXU dot)
  flat / flat_int8 contrast

Writes bench_results/stream_exact_ab/results.{json,md}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from benchmarks.harness import pipelined_seconds_per_call as timeit  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobes", default="8,16")
    ap.add_argument("--min-time", type=float, default=2.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")

    from benchmarks.datasets import clustered
    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.ops import brute_force_topk
    from vector_indexer_tpu.storage import VectorStore

    n, d, nq, k = args.n, 128, args.nq, args.k
    xb, xq = clustered(n, d, nq, seed=42)
    t0 = time.perf_counter()
    store = VectorStore(external_ids=np.arange(n, dtype=np.uint64), vectors=xb)
    idx = IvfIndex.fit(store, seed=42)
    print(f"# build {time.perf_counter() - t0:.1f}s nlist={idx.num_clusters}",
          file=sys.stderr, flush=True)
    lay = idx.layout
    _, prows = brute_force_topk(
        jax.device_put(xq), lay.vectors[: lay.rows_used], 1,
        db_row_norms=lay.row_norms[: lay.rows_used])
    gt = lay.perm[np.asarray(prows)].astype(np.int64)

    rows_out = []
    arms = []
    for p in [int(x) for x in args.nprobes.split(",")]:
        arms += [("stream", "bfloat16", p), ("stream_exact", "bfloat16", p),
                 ("stream", "int8", p)]
    arms += [("flat", "bfloat16", 0), ("flat_int8", "bfloat16", 0)]

    for method, sdt, p in arms:
        idx.stream_dtype = jnp.dtype(sdt)
        nprobe = p or idx.num_clusters
        try:
            D, I = idx.search_batch(xq, k, nprobe, method=method)
            r10 = float((I[:, :10] == gt).any(1).mean())
            sec = timeit(
                lambda: idx.search_batch_device(xq, k, nprobe, method=method),
                args.min_time)
            qps = nq / sec
            from benchmarks.harness import work_accounting
            acct = work_accounting(idx, xq, nprobe, method)
            row = dict(method=method, stream_dtype=sdt, nprobe=nprobe,
                       r10=r10, us_per_q=sec * 1e6 / nq, qps=qps,
                       resolved=acct["method"], cand_per_q=acct["cand_per_q"],
                       mb_per_q=acct["mb_per_q"])
            rows_out.append(row)
            print(f"# {method:13s} {sdt:8s} np={nprobe:5d} R@10={r10:.4f} "
                  f"{sec * 1e6 / nq:7.2f} us/q {qps:10,.0f} qps "
                  f"[{acct['method']} {acct['mb_per_q']:.2f}MB/q]",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"# {method}/{sdt}/np={nprobe} FAILED: {e!r}",
                  file=sys.stderr, flush=True)
        finally:
            idx.stream_dtype = jnp.bfloat16

    os.makedirs("bench_results/stream_exact_ab", exist_ok=True)
    with open("bench_results/stream_exact_ab/results.json", "w") as f:
        json.dump(dict(n=n, d=d, nq=nq, k=k, rows=rows_out), f, indent=2)
    with open("bench_results/stream_exact_ab/results.md", "w") as f:
        f.write(f"# stream vs stream_exact, clustered n={n:,} d={d} "
                f"nq={nq} k={k} (one window)\n\n"
                "| method | table | nprobe | R@10 | us/q | QPS | MB/q |\n"
                "|---|---|---|---|---|---|---|\n")
        for r in rows_out:
            f.write(f"| {r['method']} | {r['stream_dtype']} | {r['nprobe']} "
                    f"| {r['r10']:.4f} | {r['us_per_q']:.2f} | "
                    f"{r['qps']:,.0f} | {r['mb_per_q']:.2f} |\n")
    print(json.dumps(rows_out))


if __name__ == "__main__":
    main()
