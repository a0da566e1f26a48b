"""Benchmark CLI — reference-harness parity.

Mirrors bench_all_ivf.py's CLI surface (defaults n=100k d=128 nq=1000 k=100
nprobes=1..64 min_time=3.0 seed=42, bench_all_ivf.py:543-644) against the
TPU backend:

    python -m benchmarks.run --n 100000 --d 128 --nq 1000 --k 100
    python -m benchmarks.run --xb sift_base.fvecs --xq sift_query.fvecs \
        --gt sift_gt.ivecs --k 100 --out bench_results/sift1m

Environment-variable plumbing (N, D, NQ, K, NPROBES, MIN_TEST_DURATION,
SEED, XB_PATH, XQ_PATH, GT_PATH) matches the reference launcher
(scripts/run_faiss_bench.sh:51-66).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def _env(name, default, cast):
    v = os.environ.get(name)
    return cast(v) if v not in (None, "") else default


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=_env("N", 100_000, int))
    p.add_argument("--d", type=int, default=_env("D", 128, int))
    p.add_argument("--nq", type=int, default=_env("NQ", 1_000, int))
    p.add_argument("--k", type=int, default=_env("K", 100, int))
    p.add_argument(
        "--nprobes",
        type=lambda s: [int(x) for x in s.split(",")],
        default=_env("NPROBES", [1, 2, 4, 8, 16, 32, 64],
                     lambda s: [int(x) for x in s.split(",")]),
    )
    p.add_argument(
        "--min-time", type=float, default=_env("MIN_TEST_DURATION", 3.0, float)
    )
    p.add_argument("--seed", type=int, default=_env("SEED", 42, int))
    p.add_argument("--xb", default=_env("XB_PATH", None, str))
    p.add_argument("--xq", default=_env("XQ_PATH", None, str))
    p.add_argument("--gt", default=_env("GT_PATH", None, str))
    p.add_argument(
        "--method",
        default="auto",
        choices=[
            "auto", "dense", "dense_exact", "dense_fused", "gather",
            "gather_dma", "stream", "stream_exact", "stream_shared",
            "stream_shared_exact", "flat", "flat_exact", "flat_fused",
            "flat_xla", "dense_xla", "flat_int8", "flat_int8x1",
            "dense_int8", "dense_int8x1",
        ],
    )
    p.add_argument("--metric", default="l2", choices=["l2", "ip", "cosine"])
    p.add_argument(
        "--stream-dtype", default="bf16", choices=["bf16", "int8"],
        help="stream-table residual dtype for the stream kernels. int8 = "
        "per-cluster symmetric scales, in-kernel dequant, 4x-widened exact "
        "device re-rank. CAPACITY option, not a throughput one: it halves "
        "the selective sweep's bytes (its value when the f32 table is "
        "offloaded, see offload_main_table), but measured 1.4-1.5x slower "
        "than bf16 at equal operating points because the stream path is "
        "fixed-cost-bound, not bandwidth-bound, and int8 keeps the exact "
        "re-rank the bf16 default dropped (its quantized distances are an "
        "order coarser, p99 rel 3.7e-3). VITPU_STREAM_RERANK=0 makes int8 "
        "match bf16 qps at nprobe=8 with R@10 unchanged "
        "(bench_results/norerank_ab)",
    )
    p.add_argument(
        "--backend",
        default=_env("BACKEND", "tpu", str),
        choices=["tpu", "cpu", "both"],
        help="tpu = this framework; cpu = the numpy IVF-Flat comparator "
        "(faiss-CPU stand-in) sharing the same trained index; both = run "
        "the two back to back (parity: bench_all_ivf.py --backend)",
    )
    p.add_argument("--work-dir", default="/tmp/vix_bench_cli")
    p.add_argument("--out", default="bench_results/run")
    args = p.parse_args()

    # Validate incompatible flag combinations up front, before the dataset
    # load and the (minutes-long) TPU sweep that a late SystemExit would
    # otherwise discard.
    if args.backend in ("cpu", "both") and args.metric != "l2":
        raise SystemExit(
            "--backend cpu/both supports --metric l2 only (the numpy "
            "IVF-Flat comparator ranks by squared L2)"
        )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vector_indexer_tpu import bindings
    from vector_indexer_tpu.utils.tracing import enable_console_logging

    from . import datasets, harness

    enable_console_logging()

    if args.xb:
        xb, xq, gt = datasets.load_dataset(
            args.xb, args.xq, args.gt, n=args.n, nq=args.nq, k=args.k,
            metric=args.metric,
        )
    else:
        xb, xq = datasets.synthetic(args.n, args.d, args.nq, args.seed)
        gt = datasets.compute_ground_truth(xb, xq, args.k, metric=args.metric)

    t0 = time.perf_counter()
    index = bindings.build(xb, work_dir=args.work_dir, metric=args.metric)
    build_s = time.perf_counter() - t0
    if args.stream_dtype == "int8":
        import jax.numpy as jnp

        index._indexer.index.stream_dtype = jnp.dtype(jnp.int8)

    extra = dict(build_seconds=build_s)
    results = []
    if args.backend in ("tpu", "both"):
        results = harness.run_sweep(
            index, xq, gt, args.k, args.nprobes, args.min_time,
            method=args.method,
        )
    if args.backend in ("cpu", "both"):
        from .cpu_ivf import NumpyIvfFlat, labels_from_layout

        core = index._indexer.index
        cpu = NumpyIvfFlat(
            xb, core.centroids,
            labels_from_layout(core.layout, index.nlist, xb.shape[0]),
        )
        cpu_rows = []
        for nprobe in args.nprobes:
            if nprobe > index.nlist:
                break
            D, I = cpu.search(xq, args.k, nprobe)
            recalls = {
                f"r@{r}": harness.recall_at(I, gt, r)
                for r in (1, 10, 100) if r <= args.k
            }
            t0 = time.perf_counter()
            nrun = 0
            while True:
                cpu.search(xq, args.k, nprobe)
                nrun += 1
                elapsed = time.perf_counter() - t0
                if elapsed >= args.min_time:
                    break
            ms = elapsed * 1000.0 / (nrun * len(xq))
            cpu_rows.append(
                harness.EvalResult(nprobe, recalls, ms, 1000.0 / ms, nrun)
            )
            print(
                f"cpu nprobe={nprobe:4d} "
                + " ".join(f"{m}={v:.4f}" for m, v in recalls.items())
                + f" {1000.0 / ms:,.0f} qps"
            )
        extra["cpu_results"] = [dataclasses.asdict(r) for r in cpu_rows]
        if args.backend == "cpu":
            results = cpu_rows

    harness.save_results(
        args.out,
        config=dict(
            n=xb.shape[0], d=xb.shape[1], nq=xq.shape[0], k=args.k,
            seed=args.seed, nlist=index.nlist, method=args.method,
            metric=args.metric, backend=args.backend,
            stream_dtype=args.stream_dtype,
        ),
        results=results,
        extra=extra,
    )

    at_target = [r for r in results if r.recalls.get("r@10", 0) >= 0.95]
    best = max(at_target or results, key=lambda r: r.qps)
    print(
        f"best: nprobe={best.nprobe} R@10={best.recalls.get('r@10', 0):.4f} "
        f"{best.qps:,.0f} qps; build {build_s:.1f}s"
    )


if __name__ == "__main__":
    main()
