#!/bin/bash
# Round-3 on-chip measurement queue — self-healing against tunnel flaps:
# waits for the TPU first, retries each step once on failure/timeout.
# Results land in /tmp/q_*.log, progress in /tmp/q_driver.log.
set -u
cd /root/repo

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q_driver.log; }

wait_tpu() {
  for i in $(seq 1 40); do
    if timeout 180 python -c "import jax,jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      note "tpu up (try $i)"; return 0
    fi
    sleep 180
  done
  note "tpu never came up"; return 1
}

run() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  : > "/tmp/q_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ $rc -eq 0 ] && return 0
    [ $attempt -eq 2 ] && break   # no third attempt: don't wait for nothing
    wait_tpu || return 1
  done
  return $rc
}

wait_tpu || exit 1
run bench_gated      1500 python scripts/bench_gated.py
run bench_fullfusion 1200 env BENCH_FULL_FUSION=1 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_bg4        1200 env BENCH_BWD_GROUP=4  BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_bg5        1200 env BENCH_BWD_GROUP=5  BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_bg10       1200 env BENCH_BWD_GROUP=10 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_default    1500 env BENCH_REQUIRE_TPU=1 python bench.py
run convergence      2400 python scripts/convergence_ab.py --steps 500
run tests_tpu        3000 python -m pytest tests_tpu/ -q
note "QUEUE DONE"
