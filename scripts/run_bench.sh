#!/usr/bin/env bash
# Bench launcher: TPU preflight + env-var plumbing + harness invocation.
#
# Parity with the reference launcher (/root/reference/scripts/run_faiss_bench.sh):
# the reference preflights io_uring support before benching; the TPU-native
# equivalent preflights device availability. Env vars N, D, NQ, K, NPROBES,
# MIN_TEST_DURATION, SEED, XB_PATH, XQ_PATH, GT_PATH are forwarded to the
# harness CLI (benchmarks/run.py reads them as defaults).
set -euo pipefail

cd "$(dirname "$0")/.."

echo "== preflight: JAX device check =="
python - <<'PY'
import jax
devs = jax.devices()
print(f"backend={jax.default_backend()} devices={devs}")
if not devs:
    raise SystemExit("no JAX devices available")
PY

echo "== running benchmark =="
# All config comes from env vars (N, D, NQ, K, NPROBES, MIN_TEST_DURATION,
# SEED, XB_PATH, XQ_PATH, GT_PATH) or defaults; extra args pass through.
python -m benchmarks.run "$@"

echo "== summary =="
OUT_DIR="${OUT_DIR:-bench_results/run}"
[ -f "$OUT_DIR/results.md" ] && cat "$OUT_DIR/results.md" || true
