"""Same-window A/B for the round-5 re-rank elimination (VERDICT task 2).

The overhead decomposition (bench_results/stream_overhead) measured the
exact-re-rank stage at 8.6-9.8 us/q — 65% of the stream path — while the
kernel runs at ~HBM bandwidth. The fix attacks the NEED for the re-rank:
two-pass hi/lo bf16 cross term (_bf16_cross) + norms of the stored rows
make the kernel distance the EXACT f32 distance to the quantized point
c + r-hat, so near-boundary ordering no longer depends on a fixup pass.

Arms (production dispatch via IvfIndex.search_batch_device; the rerank
default is toggled per call through VITPU_STREAM_RERANK, read at trace
time):
  stream/rr1    bf16 two-pass + exact re-rank (old default, new kernel)
  stream/rr0    bf16 two-pass, NO re-rank (the new default)
  stream int8/rr1, int8/rr0  — does dropping the re-rank finally make
                int8's halved sweep bytes pay (VERDICT task 4)?
  flat_int8     exhaustive contrast
For rr0 arms, reports the returned-distance error vs exact f32 distances
(host-recomputed): max abs, p99 rel — the quantized-exact contract.

Writes bench_results/norerank_ab/results.{json,md}.
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
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobes", default="8,16")
    ap.add_argument("--min-time", type=float, default=2.0)
    ap.add_argument("--passes", type=int, default=3,
                    help="round-robin timing passes over all arms; each "
                    "arm reports its MINIMUM us/q (the shared chip's "
                    "background load is non-stationary — the first "
                    "single-pass run measured nprobe=16 FASTER than "
                    "nprobe=8 for the same program family)")
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
    q_sq = (xq.astype(np.float64) ** 2).sum(1)

    def d_err(D, I):
        """Returned-D error vs exact f32 distances of the returned ids
        (external id == corpus row here)."""
        ok = I >= 0
        rows = np.maximum(I, 0)
        cand = xb[rows].astype(np.float64)  # (nq, k, d)
        cross = np.einsum("qd,qkd->qk", xq.astype(np.float64), cand)
        exact = np.maximum(
            q_sq[:, None] - 2.0 * cross + (cand ** 2).sum(-1), 0.0
        )
        err = np.abs(np.where(ok, D, 0.0) - np.where(ok, exact, 0.0))
        rel = err[ok] / np.maximum(exact[ok], 1e-9)
        return float(err[ok].max()), float(np.quantile(rel, 0.99))

    rows_out = []
    arms = []
    for p in [int(x) for x in args.nprobes.split(",")]:
        arms += [
            ("stream", "bfloat16", p, "1"), ("stream", "bfloat16", p, "0"),
            ("stream", "int8", p, "1"), ("stream", "int8", p, "0"),
        ]
    arms += [("flat_int8", "bfloat16", 0, "")]

    def set_arm(sdt, rr):
        idx.stream_dtype = jnp.dtype(sdt)
        if rr:
            os.environ["VITPU_STREAM_RERANK"] = rr
        else:
            os.environ.pop("VITPU_STREAM_RERANK", None)

    # Pass 0 also computes recall + D-error and compiles every arm; later
    # passes re-TIME only (per-arm minimum defeats non-stationary load).
    meta = {}
    times = {key: [] for key in range(len(arms))}
    for pno in range(max(1, args.passes)):
        for ai, (method, sdt, p, rr) in enumerate(arms):
            if pno > 0 and ai not in meta:
                continue  # failed in pass 0
            set_arm(sdt, rr)
            nprobe = p or idx.num_clusters
            try:
                if pno == 0:
                    D, I = idx.search_batch(xq, k, nprobe, method=method)
                    r10 = float((I[:, :10] == gt).any(1).mean())
                    from benchmarks.harness import work_accounting
                    acct = work_accounting(idx, xq, nprobe, method)
                    emax, ep99 = d_err(np.asarray(D), np.asarray(I))
                    meta[ai] = (r10, acct, emax, ep99)
                sec = timeit(
                    lambda: idx.search_batch_device(
                        xq, k, nprobe, method=method),
                    args.min_time)
                times[ai].append(sec)
                print(f"# p{pno} {method:10s} {sdt:8s} rr={rr or '-'} "
                      f"np={nprobe:5d} {sec * 1e6 / nq:7.2f} us/q",
                      file=sys.stderr, flush=True)
            except Exception as e:
                print(f"# {method}/{sdt}/rr={rr}/np={nprobe} FAILED: {e!r}",
                      file=sys.stderr, flush=True)
            finally:
                idx.stream_dtype = jnp.bfloat16
                os.environ.pop("VITPU_STREAM_RERANK", None)
        # Crash-safe checkpoint after each pass: a killed/timed-out run
        # keeps pass-0 recall/D-err and every completed timing (arm
        # minima are recomputed from whatever passes finished).
        os.makedirs("bench_results/norerank_ab", exist_ok=True)
        with open("bench_results/norerank_ab/partial.json", "w") as f:
            json.dump(
                dict(n=n, d=d, nq=nq, k=k, passes_done=pno + 1,
                     arms=[list(a) for a in arms],
                     meta={str(a): [m[0], m[2], m[3]]
                           for a, m in meta.items()},
                     times={str(a): t for a, t in times.items()}),
                f, indent=2)

    for ai, (method, sdt, p, rr) in enumerate(arms):
        if ai not in meta or not times[ai]:
            continue
        r10, acct, emax, ep99 = meta[ai]
        nprobe = p or idx.num_clusters
        sec = min(times[ai])
        spread = max(times[ai]) / sec if sec else float("nan")
        qps = nq / sec
        row = dict(method=method, stream_dtype=sdt, nprobe=nprobe,
                   rerank=rr, r10=r10, us_per_q=sec * 1e6 / nq, qps=qps,
                   pass_spread=spread,
                   d_err_max=emax, d_relerr_p99=ep99,
                   resolved=acct["method"], cand_per_q=acct["cand_per_q"],
                   mb_per_q=acct["mb_per_q"])
        rows_out.append(row)
        print(f"# {method:10s} {sdt:8s} rr={rr or '-'} np={nprobe:5d} "
              f"R@10={r10:.4f} {sec * 1e6 / nq:7.2f} us/q "
              f"{qps:10,.0f} qps (x{spread:.2f} spread) "
              f"Derr={emax:.3g}/{ep99:.2g} [{acct['mb_per_q']:.2f}MB/q]",
              file=sys.stderr, flush=True)

    os.makedirs("bench_results/norerank_ab", exist_ok=True)
    with open("bench_results/norerank_ab/results.json", "w") as f:
        json.dump(dict(n=n, d=d, nq=nq, k=k, rows=rows_out), f, indent=2)
    with open("bench_results/norerank_ab/results.md", "w") as f:
        f.write(f"# re-rank elimination A/B, clustered n={n:,} d={d} "
                f"nq={nq} k={k} (one window)\n\n"
                "rr1 = exact f32 shortlist re-rank on; rr0 = kernel "
                "distances returned directly (exact-to-quantized-point; "
                "two-pass bf16 / two-pass int8 cross).\n\n"
                "| method | table | rr | nprobe | R@10 | us/q | QPS | "
                "spread | MB/q | Dmax err | Drel p99 |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows_out:
            f.write(f"| {r['method']} | {r['stream_dtype']} | "
                    f"{r['rerank'] or '-'} | {r['nprobe']} | {r['r10']:.4f} "
                    f"| {r['us_per_q']:.2f} | {r['qps']:,.0f} | "
                    f"x{r['pass_spread']:.2f} | "
                    f"{r['mb_per_q']:.2f} | {r['d_err_max']:.3g} | "
                    f"{r['d_relerr_p99']:.2g} |\n")
    print(json.dumps(rows_out))


if __name__ == "__main__":
    main()
