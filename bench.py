"""Headline benchmark in TWO stages.

Stage 1 — reference-parity synthetic operating point (n=100k, d=128,
nq=1000, k=100, seed=42 — the defaults of
/root/reference/bench/faiss_bench_official/bench_all_ivf.py:583-597),
with the reference's timing methodology (repeat the full query set until
min_test_duration, then average — bench_all_ivf.py:314-326) and recall
definition (true NN in top-10 — bench_all_ivf.py:336-350). On isotropic
noise at this scale the exhaustive fused sweep is Pareto-optimal — the
stage states that rather than hiding it.

Stage 2 — the IVF-wins regime the index exists for: a clustered
(SIFT-shaped) corpus at large n (default 4M). At 2M the fused exhaustive
sweeps still edged out the stream path on raw QPS (BENCH_r04: stream
70.8k vs flat 75.7k / flat_int8 102.1k — the round-4 verdict's headline
weakness); each corpus doubling doubles flat's per-query sweep bytes
while the selective path's probed footprint stays ~flat, so 4M is past
the crossover. The DRIVER HEADLINE (the JSON "value") is stage 2's best
floor-meeting SELECTIVE point (cand/q << n and bytes/q << flat's), so
the recorded number demonstrates the index, not just the MXU; the flat
contrast at the same scale is a separate JSON field.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": x,
   "flat_s2_qps": ..., "serve_p50_ms_nq1": ..., "stage1_qps": ...,
   "stage1_winner": ...}

serve_p50_ms_nq1 = p50 latency of a single-query call at the stage-2
winner's operating point (the reference's serving mode — its bindings
loop queries one at a time, bindings/python/src/lib.rs:74-97). On this
tunneled backend each call includes the ~28 ms device->host fetch
round-trip (CLAUDE.md); production PCIe overhead is ~us, so track the
field round-over-round rather than reading it as absolute serving
latency.

Honesty rules (round-3, kept):
  * both stages sweep real operating points and name the winning
    config/method; only floor-meeting points are headline-eligible;
  * every row reports candidates-ranked and bytes-swept per query (faiss
    `ndis` parity, bench_all_ivf.py:326-361), so a masked full sweep can
    never masquerade as selective probing;
  * the CPU baseline line states the recall its best point actually
    reached; if no path on either side meets the floor, the comparison says
    so instead of implying both sides met it.

vs_baseline = TPU QPS / CPU IVF-Flat QPS on the SAME stage-2 corpus and
trained index. The CPU comparator is a batched multi-threaded-BLAS numpy
IVF-Flat (benchmarks/cpu_ivf.py) standing in for faiss-CPU, which is
unavailable in this image (BASELINE.md).

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
        # Pipelined dispatch depth: 32 dispatches per 4-byte barrier on the
        # axon tunnel (depth 8 inflates every batch ~3.5 ms — see CLAUDE.md);
        # pointless on the CPU smoke where each interpret-mode run is slow
        # and synchronous anyway.
        import jax as _jax

        PIPE = 32 if _jax.default_backend() != "cpu" else 2
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
        rstr = " ".join(
            f"R@{r}={recalls[f'r@{r}']:.4f}" for r in (1, 10, 100)
            if f"r@{r}" in recalls
        )
        print(
            f"# {tag:9s} nprobe={nprobe:4d} {rstr} "
            f"{per_query_ms:.4f} ms/q {qps:,.0f} qps ({nrun} runs) "
            f"[{acct['method']} cand/q={acct['cand_per_q']:,.0f} "
            f"swept={acct['mb_per_q']:.2f}MB/q]",
            file=sys.stderr,
        )
    return rows


def _stage2(args):
    """Stage 2: clustered (SIFT-shaped) corpus at large n — the IVF-wins
    regime (reference protocol analog: SIFT1M sweep,
    bench_all_ivf.py:371-480). Returns (rows, cpu_best, extras); raises on
    device/build failure (main catches and falls back to the stage-1
    headline)."""
    from vector_indexer_tpu import bindings
    from vector_indexer_tpu.ops import brute_force_topk
    from benchmarks.cpu_ivf import (
        NumpyIvfFlat,
        best_qps_at_recall,
        labels_from_layout,
    )
    from benchmarks.datasets import clustered

    # --cpu smoke: shrink the hardcoded query/k axes too (interpret-mode
    # stream at nq=1024 d=128 takes >15 min on one core; numbers are
    # meaningless there anyway — the smoke checks code paths only).
    n, d = args.stage2_n, 128
    nq, k = (128, 10) if args.cpu else (1024, 100)
    xb, xq = clustered(n, d, nq, seed=args.seed)

    t0 = time.perf_counter()
    index = bindings.build(xb, work_dir="/tmp/vix_bench_s2")
    t_build = time.perf_counter() - t0

    # Exact GT from the PACKED table (no second multi-GB corpus upload
    # over the tunnel): brute-force over layout rows with the SENTINEL
    # row-norm mask (gap/tail rows DUPLICATE a real row — the packing
    # gather clamps perm=-1 to row 0 — so they must be excluded by norm,
    # not by value), then perm-map back to internal ids. Recall needs
    # the true NN only.
    import jax

    t0_gt = time.perf_counter()
    core = index._indexer.index
    lay = core.layout
    _, prows = brute_force_topk(
        jax.device_put(xq),
        lay.vectors[: lay.rows_used],
        1,
        db_row_norms=lay.row_norms[: lay.rows_used],
    )
    prows = np.asarray(prows)
    assert (prows >= 0).all(), "stage2 gt: sentinel mask left a query empty"
    gt = lay.perm[prows].astype(np.int64)
    assert (gt >= 0).all(), "stage2 gt: gap row cracked the masked top-1"
    t_gt = time.perf_counter() - t0_gt
    print(
        f"# stage2 n={n} d={d} build={t_build:.1f}s gt={t_gt:.1f}s "
        f"nlist={index.nlist}",
        file=sys.stderr,
    )

    # CPU IVF-Flat on the same corpus + trained index (a 512-query subset
    # bounds the single-host sweep cost; QPS is per-query so comparable).
    core = index._indexer.index
    cpu_index = NumpyIvfFlat(
        xb, np.asarray(core.centroids), labels_from_layout(core.layout, index.nlist, n)
    )
    nq_cpu = min(512, nq)
    cpu_qps, cpu_rows = best_qps_at_recall(
        cpu_index, xq[:nq_cpu], gt[:nq_cpu], k,
        [p for p in (2, 4, 8, 16) if p <= index.nlist],
        min_time=min(args.min_time, 1.0),
    )
    for r in cpu_rows:
        print(
            f"# stage2 cpu-ivf nprobe={r['nprobe']:4d} R@10={r['r10']:.4f} "
            f"{r['qps']:,.0f} qps",
            file=sys.stderr,
        )
    cpu_at_floor = [r for r in cpu_rows if r["r10"] >= RECALL_FLOOR]
    cpu_best = (
        max(cpu_at_floor, key=lambda r: r["qps"])
        if cpu_at_floor
        else max(cpu_rows, key=lambda r: r["r10"])
    )
    if not cpu_at_floor:
        # Stage 1 prints the same disclosure; without it the headline's
        # vs_baseline would silently compare against a sub-floor anchor.
        print(
            f"# stage2 cpu_ivf_baseline={cpu_best['qps']:.1f} qps at R@10="
            f"{cpu_best['r10']:.3f} (recall floor {RECALL_FLOOR} NOT "
            f"reached by the CPU IVF sweep; its max R@10 is "
            f"{max(r['r10'] for r in cpu_rows):.3f})",
            file=sys.stderr,
        )

    xq_dev = index.stage_queries(xq)
    nprobes = [p for p in (1, 2, 4, 8, 16, 32) if p <= index.nlist]
    rows = _sweep(
        index, xq, xq_dev, gt, k, nprobes, args.min_time, "ivf-s2"
    )
    # int8 stream tables (per-cluster scales, in-kernel dequant) halve the
    # selective sweep's bytes vs the default bf16 residuals; the widened
    # shortlist is re-ranked exactly from the f32 table on device, so the
    # recall column shows what the mode actually delivers.
    import jax.numpy as jnp

    core.stream_dtype = jnp.dtype(jnp.int8)
    try:
        rows += _sweep(
            index, xq, xq_dev, gt, k, [], args.min_time, "ivf-s2-int8",
            points=[("stream", p) for p in nprobes],
        )
    except Exception as e:  # pragma: no cover - device-dependent
        print(f"# ivf-s2-int8 sweep failed: {e!r}", file=sys.stderr)
    finally:
        core.stream_dtype = jnp.bfloat16
    # The flat contrast points, each guarded like stage 1's int8 points: a
    # device-dependent failure of one must not discard the selective rows
    # the headline needs.
    for mth in ("flat", "flat_int8"):
        try:
            rows += _sweep(
                index, xq, xq_dev, gt, k, [], args.min_time, "flat-s2",
                points=[(mth, index.nlist)],
            )
        except Exception as e:  # pragma: no cover - device-dependent
            print(f"# {mth} s2 sweep failed: {e!r}", file=sys.stderr)
    extras = dict(n=n, d=d, build_seconds=t_build, gt_seconds=t_gt,
                  nlist=index.nlist, cpu_rows=cpu_rows,
                  cpu_floor_met=bool(cpu_at_floor), index=index,
                  xq=xq, k=k)
    return rows, cpu_best, extras


def _stage2_verdict(rows2, extras2):
    """Pick stage 2's headline row and print its verdict line (shared by
    main and the --stage2-only debug entry so the two can never drift).

    Headline-eligible = genuinely SELECTIVE floor-meeting points: ranks a
    fraction of the corpus AND sweeps a fraction of flat's bytes (excludes
    the masked full-table dense sweep). Returns (best2, flat_row2) —
    flat_row2 is None when both flat contrast points failed on-device (the
    bytes criterion then falls back to the full f32 table size)."""
    flat_row2 = next((r for r in rows2 if r["method"] == "flat"), None)
    flat_mb = (
        flat_row2["mb_per_q"]
        if flat_row2 is not None
        else extras2["n"] * extras2["d"] * 4 / 2**20
    )
    at_floor2 = [r for r in rows2 if r.get("r@10", 0.0) >= RECALL_FLOOR]
    sel2 = [
        r for r in at_floor2
        if r["tag"] in ("ivf-s2", "ivf-s2-int8")
        and r["cand_per_q"] < 0.5 * extras2["n"]
        and r["mb_per_q"] < 0.5 * flat_mb
    ]
    best2 = max(sel2, key=lambda r: r["qps"]) if sel2 else None
    if best2 is None:
        print(
            "# stage2 verdict: no selective point met the floor",
            file=sys.stderr,
        )
        return None, flat_row2
    flat_str = (
        f"flat contrast: {flat_row2['qps']:,.0f} qps at R@10="
        f"{flat_row2.get('r@10', 0):.4f} ({flat_row2['mb_per_q']:.2f}MB/q)"
        if flat_row2 is not None
        else "flat contrast UNAVAILABLE (flat-s2 points failed on-device)"
    )
    print(
        f"# stage2 verdict: selective IVF meets the floor at "
        f"{best2['qps']:,.0f} qps ({best2['tag']}/{best2['method']} "
        f"nprobe={best2['nprobe']}, cand/q={best2['cand_per_q']:,.0f} of "
        f"n={extras2['n']:,}, swept={best2['mb_per_q']:.2f}MB/q); "
        + flat_str,
        file=sys.stderr,
    )
    # Serving-latency companion (round-4 task 6): p50 of a single-query
    # call at the winner's operating point — the reference's per-query
    # serving mode. Guarded: a latency failure must never cost the
    # throughput headline.
    try:
        import jax as _jax

        if "index" not in extras2:  # unit tests drive the pure-dict path
            return best2, flat_row2
        index2 = extras2["index"]
        xq1 = extras2["xq"][:1]
        reps = 20 if _jax.default_backend() != "cpu" else 3
        Dd, _ = index2.search_device(
            xq1, extras2["k"], best2["nprobe"], method=best2["method"]
        )
        _ = np.asarray(Dd[:1, :1])  # warm the nq=1 program
        lat = []
        for _i in range(reps):
            t0 = time.perf_counter()
            Dd, _ = index2.search_device(
                xq1, extras2["k"], best2["nprobe"], method=best2["method"]
            )
            _ = np.asarray(Dd[:1, :1])
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        extras2["serve_p50_ms_nq1"] = lat[len(lat) // 2]
        print(
            f"# stage2 serving latency nq=1 {best2['method']}"
            f"@nprobe={best2['nprobe']}: p50 {lat[len(lat) // 2]:.2f} ms "
            f"(incl ~28 ms tunnel fetch)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - device-dependent
        print(f"# stage2 serving-latency probe failed: {e!r}", file=sys.stderr)
    return best2, flat_row2


def _stage2_json(best2, flat_row2, cpu2_best, extras2, debug=False):
    """The stage-2 half of the final JSON payload (metric/value/vs_baseline
    + stage-2 fields), shared by main and --stage2-only."""
    metric = (
        ("[stage2-only debug] " if debug else "")
        + f"QPS at recall@10>={RECALL_FLOOR}, selective IVF on clustered "
        f"n={extras2['n']} d={extras2['d']} "
        f"(winner={best2['tag']}/{best2['method']}@nprobe={best2['nprobe']}, "
        f"cand/q={best2['cand_per_q']:.0f}, "
        f"swept={best2['mb_per_q']:.2f}MB/q)"
    )
    if not extras2.get("cpu_floor_met", True):
        metric += " [CPU baseline below recall floor]"
    out = {
        "metric": metric,
        "value": round(best2["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(best2["qps"] / max(cpu2_best["qps"], 1e-9), 2),
        "stage2_cpu_ivf_qps": round(cpu2_best["qps"], 1),
        "stage2_cpu_floor_met": extras2.get("cpu_floor_met", True),
        "stage2_build_seconds": round(extras2["build_seconds"], 1),
    }
    if "serve_p50_ms_nq1" in extras2:
        out["serve_p50_ms_nq1"] = round(extras2["serve_p50_ms_nq1"], 2)
    if flat_row2 is not None:
        out["flat_s2_qps"] = round(flat_row2["qps"], 1)
        out["flat_s2_r10"] = flat_row2.get("r@10", 0.0)
    return out


def _stage2_only_main(args) -> None:
    """Debug entry (--stage2-only): run just the stage-2 regime and print
    its verdict + a JSON line without stage1_* fields."""
    rows2, cpu2_best, extras2 = _stage2(args)
    best2, flat_row2 = _stage2_verdict(rows2, extras2)
    if best2 is None:
        print(json.dumps({
            "metric": "stage2-only: no selective floor-meeting point",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
        }))
        return
    print(json.dumps(
        _stage2_json(best2, flat_row2, cpu2_best, extras2, debug=True)
    ))


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
        "--stage2-n", type=int, default=4_000_000,
        help="clustered-corpus stage size (0 disables stage 2)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="debug: force the CPU backend (numbers meaningless; smoke only)",
    )
    p.add_argument(
        "--stage2-only", action="store_true",
        help="debug: skip stage 1 (iterating on the stage-2 regime; the "
        "JSON line then carries no stage1_* fields)",
    )
    args = p.parse_args()

    if args.quick:
        args.n, args.nq, args.min_time = 20_000, 200, 0.5
        args.stage2_n = min(args.stage2_n, 50_000)
    if args.cpu:
        # CPU smoke: stage 1 exercises every code path, so stage 2 is
        # skipped UNLESS it is the thing being smoked (--stage2-only),
        # where it runs at a tiny n with shrunk query/k axes (see _stage2).
        args.stage2_n = (
            min(args.stage2_n, 6_000) if args.stage2_only else 0
        )

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

    if args.stage2_only:
        _stage2_only_main(args)
        return

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
        f"# stage1 best: {best_row['tag']}/{best_row['method']} "
        f"nprobe={best_row['nprobe']} R@10={best_row.get('r@10', 0):.4f} "
        f"{best_qps:,.0f} qps"
        + ("" if floor_met else "  [RECALL FLOOR NOT MET]"),
        file=sys.stderr,
    )

    # ---- Stage 2: clustered large-n — the IVF-wins regime --------------
    s2 = None
    if args.stage2_n:
        try:
            s2 = _stage2(args)
        except Exception as e:  # pragma: no cover - device-dependent
            print(f"# stage2 failed: {e!r}", file=sys.stderr)

    rows2, best2, flat_row2, cpu2_best, extras2 = [], None, None, None, None
    if s2 is not None:
        rows2, cpu2_best, extras2 = s2
        best2, flat_row2 = _stage2_verdict(rows2, extras2)
        if best2 is None:
            print(
                "# (falling back to the stage-1 headline)", file=sys.stderr
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
            stage2=dict(
                sweep=rows2,
                **{k_: v for k_, v in (extras2 or {}).items()
                   if k_ not in ("index", "xq")},
            ) if rows2 else None,
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
            for r in rows + rows2:
                f.write(
                    f"| {r['tag']} | {r['nprobe']} | {r['method']} | "
                    f"{r.get('r@1', 0):.4f} | {r.get('r@10', 0):.4f} | "
                    f"{r.get('r@100', 0):.4f} | {r['ms_per_query']:.4f} | "
                    f"{r['qps']:,.0f} | {r['cand_per_q']:,.0f} | "
                    f"{r['mb_per_q']:.2f} |\n"
                )
            f.write(f"\n{verdict}\n")

    # Final JSON. Primary value = stage 2's best SELECTIVE floor-meeting
    # point (the index-wins regime); stage-1 and the flat contrast ride
    # along as separate fields so round-over-round tracking never
    # conflates the exhaustive sweep with the IVF win.
    stage1_winner = (
        f"{best_row['tag']}/{best_row['method']}@nprobe={best_row['nprobe']}"
        + ("" if floor_met else " [floor unmet]")
    )
    payload = {
        "stage1_qps": round(best_qps, 1),
        "stage1_winner": stage1_winner,
        "stage1_vs_cpu": round(best_qps / max(cpu_best["qps"], 1e-9), 2),
    }
    if best2 is not None:
        out = _stage2_json(best2, flat_row2, cpu2_best, extras2)
        out.update(payload)
    else:
        metric = (
            f"QPS at recall@10>={RECALL_FLOOR} (synthetic n={args.n} "
            f"d={args.d} nq={args.nq} k={args.k}; best of "
            f"ivf/ivf+spill/flat sweeps, winner={stage1_winner})"
        )
        if not floor_met:
            metric += f" [floor unmet; max R@10={best_row.get('r@10', 0):.3f}]"
        out = {
            "metric": metric,
            "value": round(best_qps, 1),
            "unit": "qps",
            "vs_baseline": round(best_qps / max(cpu_best["qps"], 1e-9), 2),
            **payload,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
