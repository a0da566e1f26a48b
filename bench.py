"""Headline benchmark: QPS at recall@10 >= 0.95 on the reference's default
synthetic operating point (n=100k, d=128, nq=1000, k=100, seed=42 — the
defaults of /root/reference/bench/faiss_bench_official/bench_all_ivf.py:583-597),
with the reference's timing methodology (repeat the full query set until
min_test_duration, then average — bench_all_ivf.py:314-326) and recall
definition (true NN in top-10 — bench_all_ivf.py:336-350).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": x}

Honesty rules (round-3):
  * the sweep runs nprobe up to 512, on BOTH a reference-parity single-
    assignment index ("ivf") and a SOAR-spilled one ("ivf+spill"), plus the
    flat exhaustive point — whichever operating points actually reach the
    0.95 floor are eligible for the headline, and the winning config/method
    is named in the output;
  * every row reports candidates-ranked and bytes-swept per query (faiss
    `ndis` parity, bench_all_ivf.py:326-361), so a masked full sweep can
    never masquerade as selective probing;
  * the CPU baseline line states the recall its best point actually
    reached; if no path on either side meets the floor, the comparison says
    so instead of implying both sides met it.

vs_baseline = TPU QPS / CPU IVF-Flat QPS. The CPU comparator is a batched
multi-threaded-BLAS numpy IVF-Flat (benchmarks/cpu_ivf.py) standing in for
faiss-CPU, which is unavailable in this image (BASELINE.md).

Run `python bench.py --full` for the complete report (JSON + Markdown under
bench_results/) with a small-batch latency section.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

RECALL_FLOOR = 0.95


def _sweep(index, xq, xq_dev, gt, k, nprobes, min_time, tag, points=None):
    """nprobe sweep on a built index; returns row dicts (reference timing
    methodology: pipelined device dispatch, 4-byte completion barrier)."""
    from benchmarks.harness import work_accounting

    rows = []
    core = index._indexer.index
    for method, nprobe in points or [("auto", p) for p in nprobes
                                     if p <= index.nlist]:
        D, I = index.search_sync(xq, k, nprobe, method=method)
        # Warm the device-shape program too (staged queries are padded to a
        # different batch shape): the first sweep point must not eat its
        # compile inside the timed loop.
        Ddev, _ = index.search_device(xq_dev, k, nprobe, method=method)
        _ = np.asarray(Ddev[:1, :1])
        PIPE = 32
        t0 = time.perf_counter()
        nrun = 0
        while True:
            for _ in range(PIPE):
                Ddev, _ = index.search_device(xq_dev, k, nprobe, method=method)
                nrun += 1
            _ = np.asarray(Ddev[:1, :1])  # tiny completion barrier
            elapsed = time.perf_counter() - t0
            if elapsed >= min_time:
                break
        per_query_ms = elapsed * 1000.0 / (nrun * len(xq))
        qps = 1000.0 / per_query_ms

        recalls = {}
        for rank in (1, 10, 100):
            if rank <= k:
                hit = (I[:, :rank] == gt[:, :1]).any(axis=1)
                recalls[f"r@{rank}"] = float(hit.mean())

        acct = work_accounting(core, xq, nprobe, method)
        row = dict(
            tag=tag, nprobe=nprobe, method=acct["method"], qps=qps,
            ms_per_query=per_query_ms, nrun=nrun,
            cand_per_q=acct["cand_per_q"], mb_per_q=acct["mb_per_q"],
            **recalls,
        )
        rows.append(row)
        print(
            f"# {tag:9s} nprobe={nprobe:4d} R@1={recalls.get('r@1', 0):.4f} "
            f"R@10={recalls.get('r@10', 0):.4f} "
            f"R@100={recalls.get('r@100', 0):.4f} "
            f"{per_query_ms:.4f} ms/q {qps:,.0f} qps ({nrun} runs) "
            f"[{acct['method']} cand/q={acct['cand_per_q']:,.0f} "
            f"swept={acct['mb_per_q']:.2f}MB/q]",
            file=sys.stderr,
        )
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--nq", type=int, default=1_000)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--min-time", type=float, default=3.0)
    p.add_argument("--quick", action="store_true", help="tiny config smoke run")
    p.add_argument("--full", action="store_true", help="write full sweep report")
    p.add_argument(
        "--cpu", action="store_true",
        help="debug: force the CPU backend (numbers meaningless; smoke only)",
    )
    args = p.parse_args()

    if args.quick:
        args.n, args.nq, args.min_time = 20_000, 200, 0.5

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Device-claim watchdog: the tunneled backend can hang indefinitely at
    # claim time (observed: >2 h outage where even jax.devices() never
    # returns). A hung bench leaves the driver with NO result line at all;
    # a watchdog emits an explicit failure JSON instead, then force-exits
    # (os._exit — the claim thread is stuck in native code and will not
    # honor exceptions).
    import os
    import threading

    claimed = threading.Event()

    def _watchdog():
        if not claimed.wait(timeout=900):
            print(
                json.dumps(
                    {
                        "metric": "qps@recall10>=0.95",
                        "value": 0.0,
                        "unit": "qps",
                        "vs_baseline": 0.0,
                        "error": "device claim timed out after 900s "
                        "(backend unreachable)",
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import numpy as _np_probe

    _ = _np_probe.asarray(jax.numpy.ones((8, 8)).sum())  # forces the claim
    claimed.set()

    from vector_indexer_tpu import bindings
    from vector_indexer_tpu.ops import brute_force_topk

    # Reference-parity synthetic dataset (standard normal, seeded).
    rng = np.random.default_rng(args.seed)
    xb = rng.standard_normal((args.n, args.d), dtype=np.float32)
    xq = rng.standard_normal((args.nq, args.d), dtype=np.float32)

    # Ground truth on device (exact).
    t0 = time.perf_counter()
    _, gt = brute_force_topk(xq, xb, args.k)
    gt = np.asarray(gt)
    t_gt = time.perf_counter() - t0

    # Builds: reference-parity single assignment + SOAR-spilled.
    t0 = time.perf_counter()
    index = bindings.build(xb, work_dir="/tmp/vix_bench")
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    index_sp = bindings.build(xb, work_dir="/tmp/vix_bench_sp", spill=1)
    t_build_sp = time.perf_counter() - t0

    # CPU IVF-Flat comparator (batched multi-threaded-BLAS numpy, same
    # centroids/labels as the unspilled TPU index, full query set, nprobe
    # sweep) — the honest faiss-CPU stand-in (bench_all_ivf.py:371-424).
    from benchmarks.cpu_ivf import (
        NumpyIvfFlat,
        best_qps_at_recall,
        labels_from_layout,
    )

    nprobes = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    core = index._indexer.index
    cpu_index = NumpyIvfFlat(
        xb, core.centroids, labels_from_layout(core.layout, index.nlist, args.n)
    )
    cpu_qps, cpu_rows = best_qps_at_recall(
        cpu_index, xq, gt, args.k,
        [p for p in nprobes if p <= index.nlist],
        min_time=min(args.min_time, 1.0),
    )
    cpu_at_floor = [r for r in cpu_rows if r["r10"] >= RECALL_FLOOR]
    # Best qps at the floor; if the CPU sweep never reaches it, its
    # highest-recall point (NOT its fastest low-recall point) is the only
    # honest comparison anchor.
    cpu_best = (
        max(cpu_at_floor, key=lambda r: r["qps"])
        if cpu_at_floor
        else max(cpu_rows, key=lambda r: r["r10"])
    )
    for r in cpu_rows:
        print(
            f"# cpu-ivf nprobe={r['nprobe']:4d} R@10={r['r10']:.4f} "
            f"{r['qps']:,.0f} qps",
            file=sys.stderr,
        )

    # TPU sweeps: IVF (parity), IVF+spill, and the flat exhaustive point.
    xq_dev = index.stage_queries(xq)
    xq_dev_sp = index_sp.stage_queries(xq)
    rows = _sweep(index, xq, xq_dev, gt, args.k, nprobes, args.min_time, "ivf")
    rows += _sweep(
        index_sp, xq, xq_dev_sp, gt, args.k, nprobes, args.min_time, "ivf+spill"
    )
    rows += _sweep(
        index, xq, xq_dev, gt, args.k, [], args.min_time, "flat",
        points=[("flat", index.nlist)],
    )
    # XLA-flat baseline point: 'flat' routes through the fused Pallas
    # sweep by default since the 2026-08-18 A/B (284.7k vs 70.9k qps);
    # keeping the pinned XLA program in the sweep preserves the A/B in
    # every future artifact.
    try:
        rows += _sweep(
            index, xq, xq_dev, gt, args.k, [], args.min_time,
            "flat_xla", points=[("flat_xla", index.nlist)],
        )
    except Exception as e:  # pragma: no cover - device-dependent
        print(f"# flat_xla sweep failed: {e!r}", file=sys.stderr)
    # int8 fixed-point sweep points (explicit approximate methods,
    # faiss-SQ8-style): measured like every other row — the recall column
    # states what they actually deliver, and work accounting reports the
    # 2 B / 1 B per-element sweeps honestly.
    for m in ("flat_int8", "flat_int8x1"):
        try:
            rows += _sweep(
                index, xq, xq_dev, gt, args.k, [], args.min_time,
                m, points=[(m, index.nlist)],
            )
        except Exception as e:  # pragma: no cover - device-dependent
            print(f"# {m} sweep failed: {e!r}", file=sys.stderr)

    # Headline: best qps over ALL operating points meeting the floor.
    at_floor = [r for r in rows if r.get("r@10", 0.0) >= RECALL_FLOOR]
    if at_floor:
        best_row = max(at_floor, key=lambda r: r["qps"])
        floor_met = True
    else:  # no operating point reached the floor: report the max-recall one
        best_row = max(rows, key=lambda r: r.get("r@10", 0))
        floor_met = False
    best_qps = best_row["qps"]

    # Pareto verdict: is any SELECTIVE IVF point at the floor faster than
    # flat? (On isotropic data flat often is Pareto-optimal — say so
    # explicitly rather than letting a flat win wear an IVF label.)
    flat_row = next(r for r in rows if r["tag"] == "flat")
    ivf_at_floor = [
        r for r in at_floor
        if not r["tag"].startswith("flat") and r["cand_per_q"] < args.n
    ]
    best_ivf = max(ivf_at_floor, key=lambda r: r["qps"]) if ivf_at_floor else None

    print(
        f"# build={t_build:.2f}s build_spill={t_build_sp:.2f}s gt={t_gt:.2f}s "
        f"nlist={index.nlist}",
        file=sys.stderr,
    )
    print(
        f"# cpu_ivf_baseline={cpu_best['qps']:.1f} qps at R@10="
        f"{cpu_best['r10']:.3f}"
        + (
            ""
            if cpu_best["r10"] >= RECALL_FLOOR
            else f" (recall floor {RECALL_FLOOR} NOT reached by the CPU IVF "
            f"sweep; its max R@10 is {max(r['r10'] for r in cpu_rows):.3f})"
        ),
        file=sys.stderr,
    )
    if best_ivf is not None:
        verdict = (
            f"best IVF point at floor: {best_ivf['tag']}/{best_ivf['method']} "
            f"nprobe={best_ivf['nprobe']} {best_ivf['qps']:,.0f} qps "
            f"(cand/q={best_ivf['cand_per_q']:,.0f}, "
            f"swept={best_ivf['mb_per_q']:.2f}MB/q); flat: "
            f"{flat_row['qps']:,.0f} qps ({flat_row['mb_per_q']:.2f}MB/q)"
        )
        if flat_row["qps"] >= best_ivf["qps"]:
            verdict = "flat is Pareto-optimal on this operating point; " + verdict
    else:
        max_ivf = max(
            (r for r in rows if not r["tag"].startswith("flat")),
            key=lambda r: r.get("r@10", 0),
        )
        verdict = (
            f"no selective IVF point reached R@10>={RECALL_FLOOR} "
            f"(max {max_ivf.get('r@10', 0):.3f} at {max_ivf['tag']} "
            f"nprobe={max_ivf['nprobe']}); flat is Pareto-optimal here"
        )
    print(f"# verdict: {verdict}", file=sys.stderr)
    print(
        f"# headline: {best_row['tag']}/{best_row['method']} "
        f"nprobe={best_row['nprobe']} R@10={best_row.get('r@10', 0):.4f} "
        f"{best_qps:,.0f} qps"
        + ("" if floor_met else "  [RECALL FLOOR NOT MET]"),
        file=sys.stderr,
    )

    if args.full:
        import os

        # Small-batch latency section: the IVF gather paths' home turf
        # (per-call times include this environment's ~28 ms host-fetch
        # round-trip; production PCIe overhead is ~us).
        latency_rows = []
        for nq_small in (1, 8, 64):
            xq_s = xq[:nq_small]
            for method in ("auto", "flat"):
                lat = []
                Dd, _ = index.search_device(xq_s, args.k, 16, method=method)
                _ = np.asarray(Dd[:1, :1])
                for _ in range(20):
                    t0 = time.perf_counter()
                    Dd, _ = index.search_device(xq_s, args.k, 16, method=method)
                    _ = np.asarray(Dd[:1, :1])
                    lat.append((time.perf_counter() - t0) * 1000)
                lat.sort()
                latency_rows.append(
                    dict(nq=nq_small, method=method, p50_ms=lat[len(lat) // 2])
                )
                print(
                    f"# latency nq={nq_small} {method}: p50 "
                    f"{lat[len(lat) // 2]:.2f} ms",
                    file=sys.stderr,
                )

        os.makedirs("bench_results", exist_ok=True)
        report = dict(
            config=dict(n=args.n, d=args.d, nq=args.nq, k=args.k,
                        seed=args.seed, nlist=index.nlist),
            build_seconds=t_build,
            build_spill_seconds=t_build_sp,
            cpu_ivf_qps=cpu_qps,
            cpu_ivf_sweep=cpu_rows,
            sweep=rows,
            latency=latency_rows,
            verdict=verdict,
        )
        with open("bench_results/sweep.json", "w") as f:
            json.dump(report, f, indent=2)
        with open("bench_results/sweep.md", "w") as f:
            f.write(
                "| config | nprobe | method | R@1 | R@10 | R@100 | ms/query "
                "| QPS | cand/q | MB/q |\n"
            )
            f.write("|---|---|---|---|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(
                    f"| {r['tag']} | {r['nprobe']} | {r['method']} | "
                    f"{r.get('r@1', 0):.4f} | {r.get('r@10', 0):.4f} | "
                    f"{r.get('r@100', 0):.4f} | {r['ms_per_query']:.4f} | "
                    f"{r['qps']:,.0f} | {r['cand_per_q']:,.0f} | "
                    f"{r['mb_per_q']:.2f} |\n"
                )
            f.write(f"\n{verdict}\n")

    metric = (
        f"QPS at recall@10>={RECALL_FLOOR} (synthetic n={args.n} d={args.d} "
        f"nq={args.nq} k={args.k}; best of ivf/ivf+spill/flat sweeps, "
        f"winner={best_row['tag']}/{best_row['method']}@nprobe="
        f"{best_row['nprobe']})"
    )
    if not floor_met:
        metric += f" [floor unmet; max R@10={best_row.get('r@10', 0):.3f}]"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best_qps, 1),
                "unit": "qps",
                "vs_baseline": round(best_qps / max(cpu_best["qps"], 1e-9), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
