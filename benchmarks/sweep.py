"""YAML-config-driven sweep runner.

The reference ships a bench.yaml grid (dims x counts x nprobe x concurrency)
whose consumer binary was removed from the repo (/root/reference/bench.yaml,
Cargo.toml:52-55 declares a missing bench/main.rs). This module is the living
equivalent: it reads the same-shaped YAML and runs the grid against the TPU
backend, including the concurrency axis (C query batches kept in flight —
on TPU this measures dispatch pipelining rather than thread scaling).

    python -m benchmarks.sweep [bench.yaml] [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time

import numpy as np


def _load_yaml(path: str) -> dict:
    try:
        import yaml  # type: ignore

        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        # Minimal parser for the flat key: value / key: [a, b] format used
        # by bench.yaml (no external deps guaranteed in this image).
        out: dict = {}
        with open(path) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                key, val = line.split(":", 1)
                val = val.strip()
                if val.startswith("["):
                    out[key.strip()] = [
                        _coerce(x.strip()) for x in val.strip("[]").split(",") if x.strip()
                    ]
                elif val:
                    out[key.strip()] = _coerce(val)
        return out


def _coerce(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="bench.yaml")
    p.add_argument("--out", default="bench_results/sweep")
    p.add_argument("--quick", action="store_true",
                   help="clip the grid for a smoke run")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_bench")

    from vector_indexer_tpu import bindings
    from vector_indexer_tpu.utils.tracing import enable_console_logging

    enable_console_logging()
    cfg = _load_yaml(args.config)

    dims = cfg.get("dims", [128])
    counts = cfg.get("num_vectors", [100_000])
    nprobes = cfg.get("nprobe", [16])
    concurrency = cfg.get("concurrency", [1])
    nq = int(cfg.get("num_queries", 10_000))
    k = int(cfg.get("k", 10))
    min_time = float(cfg.get("min_test_duration_secs", 30))
    seed = int(cfg.get("seed", 42))
    if args.quick:
        dims, counts = dims[:1], counts[:1]
        nprobes, concurrency = nprobes[:1], concurrency[:2]
        nq, min_time = min(nq, 1000), min(min_time, 2.0)

    rows = []
    for d, n in itertools.product(dims, counts):
        rng = np.random.default_rng(seed)
        xb = rng.standard_normal((n, d), dtype=np.float32)
        xq = rng.standard_normal((nq, d), dtype=np.float32)
        t0 = time.perf_counter()
        index = bindings.build(xb, work_dir=f"/tmp/vix_sweep_{d}_{n}")
        build_s = time.perf_counter() - t0
        xq_dev = index.stage_queries(xq)

        for nprobe, conc in itertools.product(nprobes, concurrency):
            Dd, _ = index.search_device(xq_dev, k, nprobe)
            _ = np.asarray(Dd[:1, :1])
            t0 = time.perf_counter()
            nrun = 0
            while time.perf_counter() - t0 < min_time:
                for _ in range(conc):  # conc batches in flight per barrier
                    Dd, _ = index.search_device(xq_dev, k, nprobe)
                    nrun += 1
                _ = np.asarray(Dd[:1, :1])
            dt = (time.perf_counter() - t0) / nrun
            rows.append(
                dict(d=d, n=n, nprobe=nprobe, concurrency=conc,
                     build_s=build_s, ms_per_batch=dt * 1000,
                     qps=nq / dt)
            )
            print(f"d={d} n={n} nprobe={nprobe} conc={conc}: "
                  f"{dt*1000:.1f} ms/batch {nq/dt:,.0f} qps")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(dict(config=cfg, rows=rows), f, indent=2)


if __name__ == "__main__":
    main()
