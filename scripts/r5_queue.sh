#!/bin/bash
# Round-5 TPU job queue: wait for the axon tunnel, then run the pending
# real-chip jobs SERIALIZED (the chip is shared; concurrent runs skew
# every A/B). Each job logs to /tmp/r5_<name>.log; a status line per job
# goes to /tmp/r5_queue_status. Safe to re-run: jobs whose DONE marker
# exists are skipped.
set -u
cd /root/repo
STATUS=/tmp/r5_queue_status
mark() { echo "$(date +%H:%M:%S) $1" >> "$STATUS"; }

probe() {
  timeout 120 python -c "import jax,jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}

mark "queue start; polling tunnel"
until probe; do
  mark "tunnel DOWN"
  sleep 180
done
mark "tunnel UP"

run_job() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local done_marker=/tmp/r5_done_$name
  if [ -f "$done_marker" ]; then mark "$name SKIP (done)"; return; fi
  mark "$name START"
  timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$done_marker"; fi
  mark "$name EXIT $rc"
  # After a failure, re-probe the tunnel before the next job; if it is
  # down again, wait it out rather than burning every job on a dead link.
  if [ $rc -ne 0 ]; then
    until probe; do mark "tunnel DOWN (mid-queue)"; sleep 180; done
  fi
}

run_job bench      5400 python bench.py --full
run_job decomp     3600 python scripts/decompose_stream.py --nprobes 8,16
run_job abexact    4800 python scripts/ab_stream_exact.py --n 4000000 --nprobes 8,16
run_job scale10m  10800 python scripts/bench_scale10m.py
mark "queue COMPLETE"
