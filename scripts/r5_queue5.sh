#!/bin/bash
# Round-5 late chain: when the tunnel returns, (1) real-TPU verify drive
# (incl. the new offload rerank='device' parity probe), (2) the 4M offload
# A/B with the off-devrr arm (device corrected re-rank vs host-exact vs
# device-ranked) -> bench_results/offload4m_devrr.
set -u
cd /root/repo
STATUS=/tmp/r5_queue_status
MAX_ROUNDS=${MAX_ROUNDS:-8}
mark() { echo "$(date +%H:%M:%S) [q5] $1" >> "$STATUS"; }

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
  run_job verify5 2400 python scripts/verify_drive.py
  run_job offload4m_devrr 7200 python scripts/bench_offload.py \
    --n 4000000 --nprobes 8,16,32 --out bench_results/offload4m_devrr
  if [ -f /tmp/r5_done_verify5 ] && [ -f /tmp/r5_done_offload4m_devrr ]; then
    mark "queue5 COMPLETE"
    break
  fi
  sleep 60
done
