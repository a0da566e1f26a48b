"""Unit tests for bench.py's stage-2 headline selection logic.

The driver records ONE JSON line per round from bench.py; if the verdict
helpers crash or mis-pick on an edge case (flat points failed on-device,
CPU baseline below the floor, no selective point at the floor), the round
loses its headline. These are pure functions over row dicts — testable
without a device.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def _row(tag, method, nprobe, qps, r10, cand, mb):
    return {
        "tag": tag, "method": method, "nprobe": nprobe, "qps": qps,
        "r@10": r10, "cand_per_q": cand, "mb_per_q": mb,
        "ms_per_query": 1000.0 / qps, "nrun": 1,
    }


EXTRAS = dict(n=2_000_000, d=128, build_seconds=100.0, gt_seconds=5.0,
              nlist=1024, cpu_rows=[], cpu_floor_met=True)


def test_verdict_picks_fastest_selective_floor_point(bench, capsys):
    rows = [
        _row("flat-s2", "flat", 1024, 120_000, 1.0, 2_000_000, 976.6),
        # selective, at floor, fastest
        _row("ivf-s2", "stream", 8, 90_000, 0.97, 40_000, 20.0),
        # selective, at floor, slower
        _row("ivf-s2-int8", "stream", 16, 70_000, 0.99, 80_000, 10.0),
        # faster but BELOW floor — ineligible
        _row("ivf-s2", "stream", 2, 150_000, 0.90, 10_000, 5.0),
        # at floor but NOT selective (sweeps >= half of flat's bytes)
        _row("ivf-s2", "dense", 64, 130_000, 0.99, 1_900_000, 900.0),
    ]
    best, flat = bench._stage2_verdict(rows, EXTRAS)
    assert best is not None and best["qps"] == 90_000
    assert flat is not None and flat["qps"] == 120_000
    assert "selective IVF meets the floor" in capsys.readouterr().err


def test_verdict_none_when_no_selective_point_at_floor(bench, capsys):
    rows = [
        _row("flat-s2", "flat", 1024, 120_000, 1.0, 2_000_000, 976.6),
        _row("ivf-s2", "stream", 2, 150_000, 0.90, 10_000, 5.0),
    ]
    best, flat = bench._stage2_verdict(rows, EXTRAS)
    assert best is None and flat is not None
    assert "no selective point met the floor" in capsys.readouterr().err


def test_verdict_survives_missing_flat_contrast(bench, capsys):
    """Both flat-s2 points failing on-device must not discard the
    selective rows: the bytes criterion falls back to the full f32 table
    size and the verdict line marks the contrast unavailable."""
    rows = [_row("ivf-s2", "stream", 8, 90_000, 0.97, 40_000, 20.0)]
    best, flat = bench._stage2_verdict(rows, EXTRAS)
    assert best is not None and flat is None
    assert "flat contrast UNAVAILABLE" in capsys.readouterr().err


def test_json_payload_fields(bench):
    best = _row("ivf-s2", "stream", 8, 90_000.0, 0.97, 40_000, 20.0)
    flat = _row("flat-s2", "flat", 1024, 120_000.0, 1.0, 2_000_000, 976.6)
    cpu = {"qps": 45.0, "r10": 0.99, "nprobe": 16}
    out = bench._stage2_json(best, flat, cpu, EXTRAS)
    assert out["value"] == 90_000.0 and out["unit"] == "qps"
    assert out["vs_baseline"] == 2000.0
    assert out["flat_s2_qps"] == 120_000.0
    assert out["stage2_cpu_ivf_qps"] == 45.0
    assert out["stage2_build_seconds"] == 100.0
    assert "selective IVF" in out["metric"]
    assert "[CPU baseline below recall floor]" not in out["metric"]
    # debug flag prefixes the metric, nothing else changes
    dbg = bench._stage2_json(best, flat, cpu, EXTRAS, debug=True)
    assert dbg["metric"].startswith("[stage2-only debug] ")
    assert dbg["value"] == out["value"]


def test_json_flags_subfloor_cpu_baseline_and_no_flat(bench):
    best = _row("ivf-s2", "stream", 8, 90_000.0, 0.97, 40_000, 20.0)
    cpu = {"qps": 600.0, "r10": 0.93, "nprobe": 64}
    extras = dict(EXTRAS, cpu_floor_met=False)
    out = bench._stage2_json(best, None, cpu, extras)
    assert "[CPU baseline below recall floor]" in out["metric"]
    assert out["stage2_cpu_floor_met"] is False
    assert "flat_s2_qps" not in out
