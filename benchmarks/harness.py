"""Evaluation methodology + report writing.

Parity with the reference's eval_setting / save_results
(bench_all_ivf.py:283-363, 488-535):
  * timing: repeat the full query set until min_test_duration elapsed, then
    average (ms/query, QPS, nrun) — here with pipelined device dispatch and
    a 4-byte completion barrier per run so we time search, not the
    environment's device->host transfer artifact;
  * recall: R@rank = fraction of queries whose true NN (gt[:, 0]) appears in
    the top-rank results, ranks 1/10/100 (bench_all_ivf.py:336-350);
  * reports: JSON + Markdown tables.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

log = logging.getLogger("vector_indexer_tpu")


@dataclasses.dataclass
class EvalResult:
    nprobe: int
    recalls: Dict[str, float]
    ms_per_query: float
    qps: float
    nrun: int
    # Work accounting (faiss `ndis` parity, bench_all_ivf.py:326-361):
    # mean IVF candidates ranked per query, bytes the path sweeps per
    # query, and which concrete method an 'auto' point resolved to.
    cand_per_q: float = 0.0
    mb_per_q: float = 0.0
    method: str = ""


def work_accounting(core, xq: np.ndarray, n_probe: int, method: str) -> dict:
    """faiss-`ndis`-style work counters: how much work a sweep point does.

    Returns ``method`` ('auto' resolved to the concrete path),
    ``cand_per_q`` (mean sum of probed posting-list lengths — the IVF
    candidates actually ranked) and ``mb_per_q`` (bytes the path reads per
    query, amortized over its query tile). The distinction matters: the
    selective paths (gather/stream) read ~candidate bytes, while the
    masked-sweep paths (dense/flat) read the WHOLE table regardless of
    nprobe — without these columns a flat win can masquerade as IVF
    (the round-2 headline failure mode).

    The method resolution, fallback gates, and static program sizing all
    come from ``index.dispatch.resolve`` — the SAME Decision object
    ``IvfIndex.search_batch_device`` binds to a program, so this report
    can never drift from what the dispatch actually runs (it did twice
    when the gates were hand-mirrored here; round-3 advisor, round-4
    verdict weak-item 7)."""
    from vector_indexer_tpu.index.dispatch import resolve

    lay = core.layout
    d = core.dimension
    nq = len(xq)
    n_probe = min(n_probe, core.num_clusters)
    dec = resolve(core, nq, n_probe, k=100, method=method)

    lengths = np.asarray(lay.lengths)
    if dec.program.startswith("flat"):
        cand = float(lengths.sum())
        dc = None
    else:
        # Host coarse scan (cheap: nq x nlist) -> mean probed candidates.
        cents = np.asarray(core.centroids, np.float32)
        dc = (
            (xq**2).sum(1)[:, None]
            - 2.0 * (xq @ cents.T)
            + (cents**2).sum(1)[None, :]
        )
        probe = np.argpartition(dc, n_probe - 1, axis=1)[:, :n_probe]
        cand = float(lengths[probe].sum(1).mean())

    # Offloaded indexes free lay.vectors (the f32 table) but remember the
    # padded row count; their only method is 'stream', which sizes work
    # from the stream table, so _n_pad is exact where it matters.
    table_rows = (
        lay.vectors.shape[0]
        if lay.vectors is not None
        else getattr(core, "_n_pad", lay.n)
    )
    if dec.program in ("flat_fused", "flat_xla", "dense_fused", "dense_xla"):
        # Table sweep per query tile, at the Decision's element width
        # (4 B f32, 2 B int8+residual, 1 B one-pass int8).
        bytes_q = table_rows * d * dec.elem_bytes / dec.q_tile
    elif dec.program in ("stream", "stream_shared"):
        # Probed blocks only (per-query kernel model; the shared block-major
        # variant fetches each block once per tile, so this upper-bounds it).
        bytes_q = dec.t_fixed * dec.chunk * d * dec.elem_bytes
    elif dec.program == "staged":
        # Host-resident serving: the h2d cost is the batch-wide UNION of
        # probed cells' aligned blocks (index/staged.py), amortized over
        # the batch — the analogue of the reference's per-query disk reads.
        from vector_indexer_tpu.storage.layout import ALIGN

        thresh = np.take_along_axis(
            np.sort(dc, axis=1), np.full((nq, 1), n_probe - 1), axis=1
        )
        union = np.flatnonzero((dc <= thresh).any(axis=0))
        alens = ((lengths[union] + ALIGN - 1) // ALIGN) * ALIGN
        stage_item = np.dtype(
            getattr(core, "stage_dtype", np.float32)
        ).itemsize
        bytes_q = float(alens.sum()) * (d * stage_item + 4) / nq
    else:  # gather paths: per-query candidate row gather
        bytes_q = dec.budget * d * 4
    return dict(method=dec.method, cand_per_q=cand, mb_per_q=bytes_q / 2**20)


def pipelined_seconds_per_call(fn, min_time: float = 2.0, pipe: int = 32) -> float:
    """Seconds per call of a device-dispatching ``fn``, measured with the
    tunnel-safe pipelined pattern (CLAUDE.md): PIPE async dispatches per
    4-byte completion barrier, repeated until ``min_time`` elapsed. The
    per-dispatch ~28 ms device->host fetch cost amortizes across the
    pipeline; shallower depths inflate every batch (~3.5 ms at depth 8).
    ONE shared implementation for every A/B script — the depth/barrier
    economics live here, not in per-script copies."""
    import jax

    out = fn()  # warm/compile
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    n = 0
    while True:
        for _ in range(pipe):
            out = fn()
            n += 1
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        el = time.perf_counter() - t0
        if el >= min_time:
            return el / n


def recall_at(I: np.ndarray, gt: np.ndarray, rank: int) -> float:
    """True-NN-in-top-rank recall definition (bench_all_ivf.py:336-350)."""
    return float((I[:, :rank] == gt[:, :1]).any(axis=1).mean())


def eval_setting(
    search_host: Callable[[], np.ndarray],
    search_device: Callable[[], object],
    gt: np.ndarray,
    nq: int,
    k: int,
    nprobe: int,
    min_time: float = 3.0,
) -> EvalResult:
    """One sweep point: score recall from a host fetch, time device runs."""
    I = search_host()
    recalls = {
        f"r@{rank}": recall_at(I, gt, rank) for rank in (1, 10, 100) if rank <= k
    }

    # Warm-up (compile) outside the timing loop.
    D = search_device()
    _ = np.asarray(D[:1, :1])

    # Barrier every PIPE runs: device execution is serial, so the final 4-byte
    # fetch bounds all queued runs without paying the host round-trip per run.
    # Depth 32 keeps the ~28 ms tunnel round-trip under ~1 ms/run of bias
    # (at 8 it inflated every measured batch by ~3.5 ms).
    PIPE = 32
    t0 = time.perf_counter()
    nrun = 0
    while True:
        for _ in range(PIPE):
            D = search_device()
            nrun += 1
        _ = np.asarray(D[:1, :1])  # completion barrier
        elapsed = time.perf_counter() - t0
        if elapsed >= min_time:
            break
    ms = elapsed * 1000.0 / (nrun * nq)
    return EvalResult(nprobe, recalls, ms, 1000.0 / ms, nrun)


def run_sweep(
    index,
    xq: np.ndarray,
    gt: np.ndarray,
    k: int,
    nprobes: List[int],
    min_time: float = 3.0,
    method: str = "auto",
) -> List[EvalResult]:
    """nprobe sweep against a built VectorIndex (bindings handle)."""
    results = []
    core = index._indexer.index
    # Stage the query batch in HBM once: the timed loop must measure search,
    # not a per-run host->device transfer (which costs ~28 ms over this
    # environment's tunnel and would cap any sweep at ~nq/28ms qps).
    xq_dev = index.stage_queries(xq)
    for nprobe in nprobes:
        if nprobe > index.nlist:
            break

        def search_host(nprobe=nprobe):
            _, I = core.search_batch(xq, k, nprobe, method=method)
            return np.where(I >= 0, I, -1)

        def search_device(nprobe=nprobe):
            D, _ = core.search_batch_device(xq_dev, k, nprobe, method=method)
            return D

        r = eval_setting(
            search_host, search_device, gt, len(xq), k, nprobe, min_time
        )
        acct = work_accounting(core, xq, nprobe, method)
        r.cand_per_q, r.mb_per_q = acct["cand_per_q"], acct["mb_per_q"]
        r.method = acct["method"]
        results.append(r)
        log.info(
            "nprobe=%-4d %s  %.4f ms/q  %,.0f qps (%d runs)  "
            "[%s cand/q=%.0f swept=%.2fMB/q]".replace(",", ""),
            nprobe,
            " ".join(f"{m}={v:.4f}" for m, v in r.recalls.items()),
            r.ms_per_query,
            r.qps,
            r.nrun,
            r.method,
            r.cand_per_q,
            r.mb_per_q,
        )
    return results


def save_results(
    out_dir: str,
    config: dict,
    results: List[EvalResult],
    extra: Optional[dict] = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    payload = dict(
        config=config,
        results=[dataclasses.asdict(r) for r in results],
        **(extra or {}),
    )
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(payload, f, indent=2)
    with open(os.path.join(out_dir, "results.md"), "w") as f:
        # Build/train+add wall-clock preamble (the reference times the
        # build too, bench_all_ivf.py:396-399,450-453).
        for key in (
            "build_seconds", "build_spill_seconds", "load_seconds",
            "gt_seconds",
        ):
            val = (extra or {}).get(key, config.get(key))
            if val is not None:
                name = key[: -len("_seconds")].replace("_", " ")
                f.write(f"**{name} wall**: {float(val):.1f} s\n\n")
        # Only the rank columns the run actually produced (k<100 sweeps
        # have no R@100 — omit the column rather than print nan).
        ranks = [
            rank for rank in (1, 10, 100)
            if any(f"r@{rank}" in r.recalls for r in results)
        ]
        rcols = "".join(f" R@{rank} |" for rank in ranks)
        f.write(
            f"| nprobe |{rcols} ms/query | QPS | runs "
            "| method | cand/q | MB/q |\n"
        )
        f.write("|---" * (7 + len(ranks)) + "|\n")
        for r in results:
            rvals = "".join(
                f" {r.recalls[f'r@{rank}']:.4f} |"
                if f"r@{rank}" in r.recalls else " — |"
                for rank in ranks
            )
            f.write(
                f"| {r.nprobe} |{rvals} "
                f"{r.ms_per_query:.4f} | {r.qps:,.0f} | {r.nrun} "
                f"| {r.method} | {r.cand_per_q:,.0f} | {r.mb_per_q:.2f} |\n"
            )
    log.info("results written to %s", out_dir)
