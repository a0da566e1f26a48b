#!/bin/bash
# Round-5 follow-on: wait for queue3 (scale10m -> bench --full -> offload)
# to drain the chip, then run the 4M re-rank-elimination A/B (incl. the
# int8/rr0 arm that decides VERDICT task 4).
set -u
cd /root/repo
STATUS=/tmp/r5_queue_status
MAX_ROUNDS=${MAX_ROUNDS:-6}
mark() { echo "$(date +%H:%M:%S) [q4] $1" >> "$STATUS"; }

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

# Serialize behind queue3 (shared chip): wait for its completion markers
# or for its pid to be gone.
while true; do
  if [ -f /tmp/r5_done_offload3 ]; then break; fi
  if [ -f /tmp/r5_queue3.pid ] && ! kill -0 "$(cat /tmp/r5_queue3.pid)" 2>/dev/null; then
    mark "queue3 exited without offload3 marker; proceeding"
    break
  fi
  sleep 120
done

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
  run_job norerank4m 7200 python scripts/ab_norerank.py --n 4000000 --nprobes 8,16 --passes 3
  if [ -f /tmp/r5_done_norerank4m ]; then
    mark "queue4 COMPLETE"
    exit 0
  fi
  mark "round $ROUND incomplete; retrying"
  sleep 60
done
mark "queue4 GAVE UP after $MAX_ROUNDS rounds"
