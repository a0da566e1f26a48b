"""Unit coverage of the calibrated 'auto' byte model (choose_sweep_body)
including the 2026-08-19 block-major shared-kernel gate.

All points below are real measured operating points (same-window
real-chip A/Bs recorded in the choose_sweep_body docstring and
bench_results/shared_regime); the model must keep reproducing their
verdicts."""

import numpy as np

from vector_indexer_tpu.index.ivf import (
    SHARED_MIN_NQ,
    SHARED_MIN_PROBED_ROWS,
    choose_sweep_body,
)
from vector_indexer_tpu.ops.pallas.block_stream import pick_chunk


def _pick(n, nlist, d, nq, n_probe, itemsize=2, allow_shared=False):
    lengths = np.full(nlist, n // nlist, np.int64)
    chunk = pick_chunk(lengths, d, itemsize)
    return choose_sweep_body(
        lengths, int(lengths.sum()), d, itemsize, nq, n_probe, chunk,
        allow_shared=allow_shared,
    )


def test_dense_wins_small_tables():
    # n=100k/nlist=1268: dense_fused measured 201k qps vs stream 101-124k
    # at every nprobe (2026-08-18 A/B).
    for n_probe in (4, 16, 64):
        assert _pick(100_000, 1268, 128, 1024, n_probe) == "dense"


def test_stream_wins_large_corpus_low_nprobe():
    # n=512k/nlist=2864: stream measured 93k vs dense 56k at nprobe=4.
    assert _pick(512_000, 2864, 128, 1024, 4) == "stream"


def test_dense_wins_large_corpus_high_nprobe():
    # n=512k/nlist=2864: dense measured 56k vs stream 52k/32k at nprobe>=32.
    assert _pick(512_000, 2864, 128, 1024, 64) == "dense"


def test_shared_gate_upgrades_huge_probed_footprints():
    # The shared-win regime (bench_results/shared_regime): probed
    # rows/query >= ~62.5k measured shared/stream 1.13-1.73x. Build a
    # table big enough that dense doesn't win first (n=32M, probed
    # fraction ~0.2%).
    n, nlist, d = 32_000_000, 2048, 64
    got = _pick(n, nlist, d, 4096, 4, allow_shared=True)
    assert got == "stream_shared"
    # probed rows at this point really are above the gate
    assert 4 * (n // nlist) >= SHARED_MIN_PROBED_ROWS


def test_shared_gate_needs_opt_in_and_deep_batch():
    n, nlist, d = 32_000_000, 2048, 64
    # mesh searchers don't opt in -> per-query kernel
    assert _pick(n, nlist, d, 4096, 4, allow_shared=False) == "stream"
    # shallow batches lose the sharing amortization (nq=512 measured
    # shared/stream = 1.04, inside noise)
    assert (
        _pick(n, nlist, d, SHARED_MIN_NQ // 2, 4, allow_shared=True)
        == "stream"
    )


def test_shared_gate_respects_probed_rows_floor():
    # 16k-32k probed rows/query measured shared/stream 0.84-0.93: the
    # per-query kernel must keep those points.
    n, nlist, d = 32_000_000, 8192, 64  # ~3.9k rows/list
    got = _pick(n, nlist, d, 4096, 4, allow_shared=True)
    assert got == "stream"
    assert 4 * (n // nlist) < SHARED_MIN_PROBED_ROWS
