#!/bin/bash
# Round-3 remaining on-chip queue (after the 18:36-19:26 A/B block; the
# default bench timed out when the tunnel flapped at ~19:05).  Self-healing:
# waits for the TPU first, retries each step once.  Results in /tmp/q2_*.log,
# progress in /tmp/q2_driver.log.
set -u
cd /root/repo

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q2_driver.log; }

wait_tpu() {
  for i in $(seq 1 80); do
    if timeout 180 python -c "import jax,jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      note "tpu up (try $i)"; return 0
    fi
    sleep 180
  done
  note "tpu never came up"; return 1
}

run() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  : > "/tmp/q2_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q2_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q2_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ $rc -eq 0 ] && return 0
    [ $attempt -eq 2 ] && break
    wait_tpu || return 1
  done
  return $rc
}

wait_tpu || exit 1
# comparable-iters default (the 18:xx A/Bs all ran BENCH_ITERS=10)
run bench_i10     2400 env BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
# isolate the aux-frame-head cost at the same iters
run bench_aux0    2400 env BENCH_ITERS=10 BENCH_AUX_WEIGHT=0 env BENCH_REQUIRE_TPU=1 python bench.py
# headline record (full 20 iters)
run bench_default 2700 env BENCH_REQUIRE_TPU=1 python bench.py
# 500-step XLA-vs-Pallas CE drift bound (VERDICT r2 item 2)
run convergence   3600 python scripts/convergence_ab.py --steps 500
# full on-chip gate suite at current HEAD
run tests_tpu     3600 python -m pytest tests_tpu/ -q
note "QUEUE2 DONE"
