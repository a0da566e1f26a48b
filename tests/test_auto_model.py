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


def test_shared_gate_upgrades_enormous_probed_footprints():
    # The shared-win regime vs the FUSED per-query kernel: shared/fused
    # 1.25-1.27x at 617k probed rows/query, 0.59-0.92 at <=319k
    # (bench_results/fused_stream_ab/shared_corner*). Build a table big
    # enough that dense doesn't win first (n=32M: pick_q_tile's HBM cap
    # shrinks dense to 8-query tiles).
    n, nlist, d = 32_000_000, 2048, 64
    got = _pick(n, nlist, d, 4096, 64, allow_shared=True)  # 1M rows/q
    assert got == "stream_shared"
    # probed rows at this point really are above the gate
    assert 64 * (n // nlist) >= SHARED_MIN_PROBED_ROWS


def test_shared_gate_needs_opt_in_and_deep_batch():
    n, nlist, d = 32_000_000, 2048, 64
    # mesh searchers don't opt in -> per-query kernel (1M rows/q point)
    assert _pick(n, nlist, d, 4096, 64, allow_shared=False) == "stream"
    # shallow batches lose the sharing amortization (sharing needs a
    # deep query tile; nq=512 measured shared/stream = 1.04 already
    # against the unfused kernel)
    assert (
        _pick(n, nlist, d, SHARED_MIN_NQ // 2, 64, allow_shared=True)
        == "stream"
    )


def test_shared_gate_respects_probed_rows_floor():
    # At or below 319k probed rows/query the fused per-query kernel
    # measured faster than shared (0.59-0.92): those points must stay
    # on the per-query kernel.
    n, nlist, d = 32_000_000, 2048, 64  # 15.6k rows/list
    got = _pick(n, nlist, d, 4096, 16, allow_shared=True)  # 250k rows/q
    assert got == "stream"
    assert 16 * (n // nlist) < SHARED_MIN_PROBED_ROWS
