"""Larger-than-HBM artifact: offloaded (int8 + host-rerank) serving at scale.

Demonstrates the reference's bigger-than-RAM design point
(/root/reference/src/shards.rs:188-349 — disk-resident lists, selective
reads) translated to the TPU memory hierarchy: the f32 main table is freed
from HBM and queries run a selective int8 stream sweep + exact host
re-rank. The artifact records HBM-resident bytes and the measured
QPS/recall in full vs offloaded mode, at a corpus d-scaled so its f32
footprint is meaningful relative to the single chip's HBM.

    python scripts/bench_offload.py --n 4000000 --out bench_results/offload4m
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def live_device_bytes() -> int:
    import jax

    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in jax.live_arrays()
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--nq", type=int, default=1_024)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--nprobes", default="8,16,32")
    p.add_argument("--min-time", type=float, default=3.0)
    p.add_argument("--out", default="bench_results/offload4m")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vector_indexer_tpu.index import IvfIndex
    from vector_indexer_tpu.ops import brute_force_topk
    from vector_indexer_tpu.storage import VectorStore

    # Clustered (SIFT-shaped) corpus: the realistic IVF regime, where
    # moderate nprobe reaches high recall (isotropic noise at this scale
    # would need nprobe in the hundreds and tell nothing about offload).
    g = np.random.default_rng(42)
    ncent = 1024
    centers = g.normal(0, 4.0, size=(ncent, args.d)).astype(np.float32)
    xb = np.empty((args.n, args.d), np.float32)
    step = 500_000
    for s in range(0, args.n, step):
        e = min(s + step, args.n)
        xb[s:e] = (
            centers[g.integers(0, ncent, e - s)]
            + g.normal(0, 1.0, (e - s, args.d))
        ).astype(np.float32)
    xq = (
        centers[g.integers(0, ncent, args.nq)]
        + g.normal(0, 1.0, (args.nq, args.d))
    ).astype(np.float32)
    nprobes = [int(x) for x in args.nprobes.split(",")]

    t0 = time.perf_counter()
    store = VectorStore(
        external_ids=np.arange(args.n, dtype=np.uint64), vectors=xb
    )
    idx = IvfIndex.fit(store, seed=42)
    t_build = time.perf_counter() - t0
    print(f"# build {t_build:.1f}s nlist={idx.num_clusters}", file=sys.stderr)

    _, gt = brute_force_topk(xq, xb, 10)
    gt = np.asarray(gt)

    def sweep(tag, search):
        rows = []
        for nprobe in nprobes:
            D, I = search(xq, args.k, nprobe)
            r10 = float((I[:, :10] == gt[:, :1]).any(1).mean())
            t0 = time.perf_counter()
            nrun = 0
            while True:
                search(xq, args.k, nprobe)
                nrun += 1
                el = time.perf_counter() - t0
                if el >= args.min_time:
                    break
            qps = nrun * args.nq / el
            rows.append(dict(tag=tag, nprobe=nprobe, r10=r10, qps=qps,
                             nrun=nrun))
            print(
                f"# {tag:9s} nprobe={nprobe:3d} R@10={r10:.4f} "
                f"{qps:,.0f} qps ({nrun} runs)",
                file=sys.stderr,
            )
        return rows

    # Full mode (f32 table + bf16 stream sweep), host-result path so every
    # mode times the same end-to-end contract (device sweep + host mapping).
    rows = sweep("full", lambda q, k, p: idx.search_batch(q, k, p, "stream"))
    bytes_full = live_device_bytes()  # after the sweep: bf16 table resident

    # Offload: free the f32 (and bf16) tables; int8 sweep. Three serving
    # modes over the SAME stream table: exact host re-rank, two-layer
    # corrected device re-rank (ops/correction.py; built while the f32
    # table is still staged, hence rerank='device' at offload time), and
    # device-ranked (raw quantized distances).
    idx.offload_main_table(rerank="device")
    bytes_off_rr = live_device_bytes()  # incl. the correction table
    idx._offload_rerank = "host"  # flip serving mode on the same table
    bytes_off = bytes_off_rr - (
        idx._corr_table.hbm_bytes if idx._corr_table is not None else 0
    )
    rows += sweep(
        "off-host", lambda q, k, p: idx.search_batch(q, k, p)
    )
    idx._offload_rerank = "device"
    rows += sweep(
        "off-devrr", lambda q, k, p: idx.search_batch(q, k, p)
    )
    idx._offload_rerank = "none"
    rows += sweep(
        "off-dev", lambda q, k, p: idx.search_batch(q, k, p)
    )

    f32_table_bytes = args.n * args.d * 4
    report = dict(
        config=dict(n=args.n, d=args.d, nq=args.nq, k=args.k,
                    nlist=idx.num_clusters, nprobes=nprobes),
        build_seconds=t_build,
        f32_table_bytes=f32_table_bytes,
        hbm_bytes_full_mode=bytes_full,
        hbm_bytes_offloaded=bytes_off,
        hbm_bytes_offloaded_devrr=bytes_off_rr,
        rows=rows,
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(args.out, "results.md"), "w") as f:
        f.write(
            f"# Larger-than-HBM offload artifact (n={args.n:,} d={args.d})\n\n"
            f"f32 main table alone: {f32_table_bytes / 2**30:.2f} GiB. "
            f"HBM-resident: {bytes_full / 2**30:.2f} GiB full mode -> "
            f"{bytes_off / 2**30:.2f} GiB offloaded "
            f"({bytes_full / max(bytes_off, 1):.1f}x smaller; the remaining "
            f"bytes are the int8 stream table + row maps + centroids).\n\n"
            "Modes: `full` = f32 table + bf16 stream sweep; `off-host` = "
            "int8 sweep + exact host re-rank (bounded by THIS container's "
            "single host core — production TPU-VM hosts have dozens); "
            f"`off-devrr` = int8 sweep + two-layer corrected re-rank ON "
            f"DEVICE (~14-bit distances, no host GEMM; "
            f"+{(bytes_off_rr - bytes_off) / 2**30:.2f} GiB HBM); "
            "`off-dev` = int8 sweep, device-ranked (distances carry int8 "
            "quantization error, result sets match). All modes timed "
            "through the host-result path (includes the environment's "
            "~28 ms/batch device-fetch tunnel cost).\n\n"
            "| mode | nprobe | R@10 | QPS |\n|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['tag']} | {r['nprobe']} | {r['r10']:.4f} | "
                f"{r['qps']:,.0f} |\n"
            )
    print(
        f"# hbm full={bytes_full / 2**30:.2f}GiB offloaded="
        f"{bytes_off / 2**30:.2f}GiB", file=sys.stderr,
    )


if __name__ == "__main__":
    main()
