"""Decompose the stream path's per-query cost at the stage-2 operating
point (VERDICT r4 task 2): at the round-4 winner (clustered n=2M, d=128,
nprobe=8, bf16 stream) the probed HBM bytes justify ~3.2 us/q at the
kernel's measured 625 GB/s ceiling, but the measured end-to-end cost was
14.1 us/q.

Standalone per-stage timings do NOT compose here (each dispatch pays
~1-4 us/q of fixed per-call cost at one 256-query tile), so the
decomposition is MARGINAL: cumulative program variants P0..P4, each one
stage longer, at the production shape (nq=1024, q_tile=256, lax.map
tiling), timed in one window. Marginal cost of stage i = P_i - P_{i-1}.

  P0 coarse      — coarse matmul + approx top-n_probe cell pick
  P1 +taskgrid   — probe -> (blk/cid/nval, qc rows, bias) + fan packing
  P2 +kernel     — the block-stream Pallas sweep
  P3 +select     — inf-mask + concat + approx_min_k (2k shortlist) (=no-rerank program)
  P4 +rerank     — exact f32 shortlist re-rank (the full production program)
  P4f            — full program with the fused-selection kernel forced on

Plus rerank micro-splits (gather vs einsum vs alternatives) at the same
shapes. Writes bench_results/stream_overhead/results.json (+ .md).

Usage: python scripts/decompose_stream.py [--n 2000000] [--nprobes 8,16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from benchmarks.harness import pipelined_seconds_per_call as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--nprobes", type=str, default="8,16")
    ap.add_argument("--min-time", type=float, default=2.0)
    ap.add_argument("--dtypes", type=str, default="bfloat16",
                    help="comma list; e.g. bfloat16,int8 decomposes both "
                    "stream table dtypes on ONE built index (same window)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")

    from benchmarks.datasets import clustered
    from vector_indexer_tpu.index.ivf import (
        IvfIndex,
        _exact_rerank,
        _score,
    )
    from vector_indexer_tpu.ops.distance import sq_norms
    from vector_indexer_tpu.ops.pallas.block_stream import (
        FAN,
        _block_stream_call,
        block_stream_search,
        build_task_grid,
        per_query_slots,
    )
    from vector_indexer_tpu.storage.vector_store import VectorStore

    n, d = args.n, args.d
    nq = args.nq
    q_tile = 256
    k = 100
    xb, xq = clustered(n, d, nq, seed=42)

    t0 = time.perf_counter()
    store = VectorStore(external_ids=np.arange(n, dtype=np.uint64), vectors=xb)
    core = IvfIndex.fit(store, seed=42)
    print(f"# build {time.perf_counter() - t0:.1f}s nlist={core.num_clusters}",
          file=sys.stderr, flush=True)

    lay = core.layout
    lengths = np.asarray(lay.lengths)
    centroids, c_sq = core._device_tables()
    qdev = jnp.asarray(xq)
    metric = "l2"
    kc = centroids.shape[0]

    rows_out = []
    points = [
        (jnp.dtype(ds), int(x))
        for ds in args.dtypes.split(",")
        for x in args.nprobes.split(",")
    ]
    st = None
    cur_dtype = None
    for dtype, n_probe in points:
        if dtype != cur_dtype:
            core.stream_dtype = dtype
            st = core._stream_table(dtype)
            cur_dtype = dtype
        chunk = st.chunk
        t_fixed = per_query_slots(lengths, n_probe, chunk=chunk)
        t_sub = t_fixed // FAN
        kk = min(max(2 * k, 64), t_fixed * chunk)

        def fan_flat(a2d):
            return jnp.stack(
                [a2d[:, f * t_sub:(f + 1) * t_sub].T.reshape(-1)
                 for f in range(FAN)]
            )

        def fan_steps(a3d):
            return jnp.stack(
                [a3d[:, f * t_sub:(f + 1) * t_sub].transpose(1, 0, 2)
                 .reshape(-1, a3d.shape[-1]) for f in range(FAN)],
                axis=1,
            )

        # Cumulative variants: each tile function runs stages 0..stage and
        # returns whatever the last stage produced (forcing its compute).
        # Every device table rides in as a jit ARGUMENT (tabs pytree):
        # closure-captured arrays are serialized into the StableHLO module
        # and the axon relay rejects the multi-hundred-MB compile request
        # (HTTP 413).
        def tile_fn(qt, sta, tabs, stage: int):
            centroids, c_sq, main_vecs, row_norms = tabs
            q_sq = sq_norms(qt)
            dc = _score(qt, centroids, c_sq, q_sq, "l2")
            if kc > 1024:
                _, probe = jax.lax.approx_min_k(dc, n_probe,
                                                recall_target=0.99)
            else:
                _, probe = jax.lax.top_k(-dc, n_probe)
            if stage == 0:
                return probe.astype(jnp.float32)
            blk2d, cid2d, nval2d, qc_all, bias2d = build_task_grid(
                qt, sta, probe, t_fixed, metric
            )
            qvec = fan_steps(qc_all)
            blkF = fan_flat(blk2d)
            sclF = fan_flat(sta.scales[cid2d])
            biasF = fan_flat(bias2d)
            if stage == 1:
                return qvec[:, :, :1] + biasF.T[:, :, None]
            outs = _block_stream_call(
                qvec, sta.vecs, sta.norms, blkF, sclF, biasF,
                nq=q_tile, t_sub=t_sub, metric=metric, chunk=chunk,
            )
            if stage == 2:
                return outs[0][:, :, 0, :]
            lane = jnp.arange(chunk, dtype=jnp.int32)[None, None, :]
            parts = []
            for f in range(FAN):
                dist_f = outs[f][:, :, 0, :]
                nval_f = nval2d[:, f * t_sub:(f + 1) * t_sub]
                ok = lane < nval_f[:, :, None]
                parts.append(
                    jnp.where(ok, dist_f, jnp.inf).reshape(
                        q_tile, t_sub * chunk
                    )
                )
            dist_cat = jnp.concatenate(parts, axis=1)
            dvals, ci = jax.lax.approx_min_k(dist_cat, kk,
                                             recall_target=0.99)
            ci0 = jnp.maximum(ci, 0)
            f_sel = ci0 // (t_sub * chunk)
            rem = ci0 % (t_sub * chunk)
            s_sel = f_sel * t_sub + rem // chunk
            blk_sel = jnp.take_along_axis(blk2d, s_sel, axis=1)
            rows = jnp.where(
                (ci >= 0) & jnp.isfinite(dvals),
                sta.to_main[blk_sel * chunk + rem % chunk], -1,
            )
            if stage == 3:
                return dvals
            return _exact_rerank(
                qt, q_sq, rows, main_vecs, row_norms, k, metric
            )[0]

        @functools.partial(jax.jit, static_argnames=("stage",))
        def prog(queries, sta, tabs, stage: int):
            tiles = queries.reshape(nq // q_tile, q_tile, d)
            return jax.lax.map(lambda qt: tile_fn(qt, sta, tabs, stage), tiles)

        # Full program with the fused-selection stream kernel forced on
        # (same rerank epilogue).
        def tile_fused(qt, sta, tabs):
            centroids, c_sq, main_vecs, row_norms = tabs
            q_sq = sq_norms(qt)
            dc = _score(qt, centroids, c_sq, q_sq, "l2")
            if kc > 1024:
                _, probe = jax.lax.approx_min_k(dc, n_probe,
                                                recall_target=0.99)
            else:
                _, probe = jax.lax.top_k(-dc, n_probe)
            dvals, rows = block_stream_search(
                qt, sta, probe, kk, t_fixed=t_fixed, metric=metric,
                approx=True, fused=True,
            )
            return _exact_rerank(
                qt, q_sq, rows, main_vecs, row_norms, k, metric
            )[0]

        @jax.jit
        def prog_fused(queries, sta, tabs):
            tiles = queries.reshape(nq // q_tile, q_tile, d)
            return jax.lax.map(lambda qt: tile_fused(qt, sta, tabs), tiles)

        # Hoisted-re-rank variant (the round-5 production structure,
        # ivf.py::_ivf_search_stream_program): the sweep tiles return the
        # kk-wide shortlist and ONE full-batch exact re-rank runs outside
        # the tile loop. Same-window A/B against P4 (per-tile re-rank).
        def tile_rows(qt, sta, tabs):
            centroids, c_sq, _, _ = tabs
            q_sq = sq_norms(qt)
            dc = _score(qt, centroids, c_sq, q_sq, "l2")
            _, probe = (
                jax.lax.approx_min_k(dc, n_probe, recall_target=0.99)
                if kc > 1024 else jax.lax.top_k(-dc, n_probe)
            )
            _, rows = block_stream_search(
                qt, sta, probe, kk, t_fixed=t_fixed, metric=metric,
                approx=True, fused=False,
            )
            return rows

        @jax.jit
        def prog_hoisted(queries, sta, tabs):
            _, _, main_vecs, row_norms = tabs
            tiles = queries.reshape(nq // q_tile, q_tile, d)
            rows = jax.lax.map(
                lambda qt: tile_rows(qt, sta, tabs), tiles
            ).reshape(nq, kk)
            return _exact_rerank(
                queries, sq_norms(queries), rows, main_vecs, row_norms,
                k, metric,
            )[0]

        mt = args.min_time
        tabs = (centroids, c_sq, lay.vectors, lay.row_norms)
        t_stage = {}
        for stage, name in [
            (0, "P0_coarse"), (1, "P1_taskgrid"), (2, "P2_kernel"),
            (3, "P3_select"), (4, "P4_rerank_full"),
        ]:
            t_stage[name] = timeit(
                lambda s=stage: prog(qdev, st, tabs, s), mt
            )
        t_stage["P4f_fused_full"] = timeit(
            lambda: prog_fused(qdev, st, tabs), mt
        )
        t_stage["P5_hoisted_full"] = timeit(
            lambda: prog_hoisted(qdev, st, tabs), mt
        )

        # Two-dispatch split: the sweep program returns the (nq, kk)
        # shortlist rows and a SEPARATE jitted re-rank program consumes
        # them — queued back-to-back by async dispatch (no host sync
        # between). Measures whether the single fused program's in-graph
        # re-rank cost (P5 - P3 ~ 7 us/q vs ~3 standalone) is an XLA
        # scheduling artifact the program boundary removes.
        @jax.jit
        def prog_rows(queries, sta, tabs):
            tiles = queries.reshape(nq // q_tile, q_tile, d)
            return jax.lax.map(
                lambda qt: tile_rows(qt, sta, tabs), tiles
            ).reshape(nq, kk)

        @jax.jit
        def prog_rr(queries, rows, main_vecs, row_norms):
            return _exact_rerank(
                queries, sq_norms(queries), rows, main_vecs, row_norms,
                k, metric,
            )[0]

        t_stage["P6_twodispatch"] = timeit(
            lambda: prog_rr(
                qdev, prog_rows(qdev, st, tabs), lay.vectors, lay.row_norms
            ),
            mt,
        )

        # Rerank micro-split at the same shapes: gather vs einsum vs
        # all-pairs-matmul alternative, on a fixed shortlist.
        # Build a (nq, kk) int32 shortlist for the rerank micro-splits.
        @jax.jit
        def p3_rows(queries, sta, tabs):
            centroids, c_sq, _, _ = tabs
            tiles = queries.reshape(nq // q_tile, q_tile, d)

            def tf(qt):
                q_sq = sq_norms(qt)
                dc = _score(qt, centroids, c_sq, q_sq, "l2")
                _, probe = (
                    jax.lax.approx_min_k(dc, n_probe, recall_target=0.99)
                    if kc > 1024 else jax.lax.top_k(-dc, n_probe)
                )
                _, rows = block_stream_search(
                    qt, sta, probe, kk, t_fixed=t_fixed, metric=metric,
                    approx=True, fused=False,
                )
                return rows

            return jax.lax.map(tf, tiles).reshape(nq, kk)

        rows_fix = jax.device_put(np.asarray(p3_rows(qdev, st, tabs)))
        q_sq_host = jax.device_put(np.asarray(sq_norms(qdev)))

        @jax.jit
        def rr_gather(rws, main_vecs):
            cand = main_vecs[jnp.maximum(rws, 0)]
            return cand[:, :, :2].sum(axis=(1, 2))

        @jax.jit
        def rr_full(q, qsq, rws, main_vecs, row_norms):
            return _exact_rerank(
                q, qsq, rws, main_vecs, row_norms, k, metric
            )[0]

        @jax.jit
        def rr_allpairs(q, qsq, rws, main_vecs, row_norms):
            # Alternative einsum lowering: one big (nq*kk, d) @ (d, nq)
            # matmul + diagonal-block extraction instead of the batched
            # GEMV (einsum qd,qkd->qk pads N=1 onto the MXU's 128 lanes).
            rows0 = jnp.maximum(rws, 0)
            cand = main_vecs[rows0].reshape(-1, d)  # (nq*kk, d)
            cross_all = jnp.dot(
                cand, q.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (nq*kk, nq)
            qi = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), kk)
            cross = jnp.take_along_axis(
                cross_all, qi[:, None], axis=1
            ).reshape(nq, kk)
            exact = jnp.maximum(
                qsq[:, None] - 2.0 * cross + row_norms[rows0], 0.0
            )
            exact = jnp.where(rws >= 0, exact, jnp.inf)
            from vector_indexer_tpu.ops.topk import topk_smallest

            dv, order = topk_smallest(exact, k)
            return dv

        t_stage["rr_gather_only"] = timeit(
            lambda: rr_gather(rows_fix, lay.vectors), mt)
        t_stage["rr_full"] = timeit(
            lambda: rr_full(qdev, q_sq_host, rows_fix, lay.vectors,
                            lay.row_norms), mt)
        t_stage["rr_allpairs"] = timeit(
            lambda: rr_allpairs(qdev, q_sq_host, rows_fix, lay.vectors,
                                lay.row_norms), mt)

        us = {kname: v * 1e6 / nq for kname, v in t_stage.items()}
        marg = {
            "coarse": us["P0_coarse"],
            "taskgrid": us["P1_taskgrid"] - us["P0_coarse"],
            "kernel": us["P2_kernel"] - us["P1_taskgrid"],
            "select": us["P3_select"] - us["P2_kernel"],
            "rerank": us["P4_rerank_full"] - us["P3_select"],
        }
        sweep_us = (
            t_fixed * chunk * d * dtype.itemsize / 625e9 * 1e6
        )
        row = dict(
            n=n, d=d, n_probe=n_probe, dtype=str(dtype), chunk=chunk,
            t_fixed=t_fixed, nq=nq, kk=kk,
            probed_rows_per_q=t_fixed * chunk,
            sweep_bytes_per_q=t_fixed * chunk * d * dtype.itemsize,
            sweep_floor_us=sweep_us,
            us_per_q=us, marginal_us=marg,
        )
        rows_out.append(row)
        print(f"# nprobe={n_probe} chunk={chunk} t_fixed={t_fixed} "
              f"rows/q={t_fixed * chunk} kk={kk} "
              f"(sweep byte floor {sweep_us:.2f} us/q)", file=sys.stderr)
        for name, v in us.items():
            print(f"#   {name:18s} {v:8.2f} us/q", file=sys.stderr)
        print("#   marginals: " + "  ".join(
            f"{kx}={v:.2f}" for kx, v in marg.items()), file=sys.stderr)
        sys.stderr.flush()

    os.makedirs("bench_results/stream_overhead", exist_ok=True)
    with open("bench_results/stream_overhead/results.json", "w") as f:
        json.dump(dict(rows=rows_out), f, indent=2)
    with open("bench_results/stream_overhead/results.md", "w") as f:
        f.write("# Stream path overhead decomposition (us/query)\n\n")
        f.write(
            f"Production shape (nq={nq}, q_tile={q_tile}, k={k}), "
            "clustered corpus, marginal costs from cumulative program "
            "variants timed in one window.\n\n"
        )
        f.write("| dtype | nprobe | rows/q | byte-floor | coarse | taskgrid | "
                "kernel | select | rerank | full | fused-full | "
                "hoisted-full |\n")
        f.write("|---" * 12 + "|\n")
        for r in rows_out:
            m = r["marginal_us"]
            f.write(
                f"| {r['dtype']} | {r['n_probe']} | {r['probed_rows_per_q']} | "
                f"{r['sweep_floor_us']:.2f} | {m['coarse']:.2f} | "
                f"{m['taskgrid']:.2f} | {m['kernel']:.2f} | "
                f"{m['select']:.2f} | {m['rerank']:.2f} | "
                f"{r['us_per_q']['P4_rerank_full']:.2f} | "
                f"{r['us_per_q']['P4f_fused_full']:.2f} | "
                f"{r['us_per_q']['P5_hoisted_full']:.2f} |\n"
            )
        f.write("\nRerank micro-split (standalone dispatches — include "
                "~1-2 us/q fixed dispatch cost):\n\n")
        f.write("| dtype | nprobe | kk | gather-only | full rerank | all-pairs |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows_out:
            u = r["us_per_q"]
            f.write(
                f"| {r['dtype']} | {r['n_probe']} | {r['kk']} | "
                f"{u['rr_gather_only']:.2f} "
                f"| {u['rr_full']:.2f} | {u['rr_allpairs']:.2f} |\n"
            )
    print(json.dumps({
        f"{r['dtype']}:np{r['n_probe']}": r["marginal_us"] for r in rows_out
    }))


if __name__ == "__main__":
    main()
