#!/bin/bash
# Round-5 final TPU jobs (fresh container: /tmp state from the earlier
# queues is gone). Serialized on the single shared chip, tunnel-probe
# gated, DONE-marker + retry structure as r5_queue.sh.
set -u
cd /root/repo
STATUS=/tmp/r5_queue_status
MAX_ROUNDS=${MAX_ROUNDS:-6}
mark() { echo "$(date +%H:%M:%S) [q3] $1" >> "$STATUS"; }

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

for ROUND in $(seq 1 "$MAX_ROUNDS"); do
  run_job scale10m 10800 python scripts/bench_scale10m.py
  run_job bench3   5400 python bench.py --full
  run_job offload3 5400 python scripts/bench_offload.py
  if [ -f /tmp/r5_done_scale10m ] && [ -f /tmp/r5_done_bench3 ] \
     && [ -f /tmp/r5_done_offload3 ]; then
    mark "queue3 COMPLETE"
    exit 0
  fi
  mark "round $ROUND incomplete; retrying failed jobs"
  sleep 60
done
mark "queue3 GAVE UP after $MAX_ROUNDS rounds"
