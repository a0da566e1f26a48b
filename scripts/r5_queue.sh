#!/bin/bash
# Round-5 TPU job queue: wait for the axon tunnel, then run the pending
# real-chip jobs SERIALIZED (the chip is shared; concurrent runs skew
# every A/B). Each job logs to /tmp/r5_<name>.log; a status line per job
# goes to /tmp/r5_queue_status. Jobs that fail (tunnel flap, fault) are
# retried on the next outer round, up to MAX_ROUNDS; jobs whose DONE
# marker exists are skipped, so the script is safe to re-run.
set -u
cd /root/repo
STATUS=/tmp/r5_queue_status
MAX_ROUNDS=${MAX_ROUNDS:-8}
mark() { echo "$(date +%H:%M:%S) $1" >> "$STATUS"; }

probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}

wait_tunnel() {
  until probe; do
    mark "tunnel DOWN"
    sleep 180
  done
  mark "tunnel UP"
}

run_job() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local done_marker=/tmp/r5_done_$name
  [ -f "$done_marker" ] && return 0
  wait_tunnel
  mark "$name START (round $ROUND)"
  timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$done_marker"
  mark "$name EXIT $rc"
  return $rc
}

mark "queue start"
for ROUND in $(seq 1 "$MAX_ROUNDS"); do
  run_job bench      5400 python bench.py --full
  run_job decomp     3600 python scripts/decompose_stream.py --nprobes 8,16
  run_job abexact    4800 python scripts/ab_stream_exact.py --n 4000000 --nprobes 8,16
  run_job scale10m  10800 python scripts/bench_scale10m.py
  if [ -f /tmp/r5_done_bench ] && [ -f /tmp/r5_done_decomp ] \
     && [ -f /tmp/r5_done_abexact ] && [ -f /tmp/r5_done_scale10m ]; then
    mark "queue COMPLETE"
    exit 0
  fi
  mark "round $ROUND incomplete; retrying failed jobs"
  sleep 60
done
mark "queue GAVE UP after $MAX_ROUNDS rounds"
