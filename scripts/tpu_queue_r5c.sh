#!/bin/bash
# Round-5 queue, part C (waits for part B to exit):
#  1. grouped-VQ arms at the EXACT 2k-step protocol of part A's gain table
#     (same seed/fixture/eval -> part A's zero/ae/vq rows are directly
#     comparable): does measured VQ gain scale with the G*ln(K) ceiling?
#  2. int4 weight-streaming sampler benches (batch 64 + 128), vs the int8
#     and bf16 rows measured in part B
#  3. the full on-chip test suite (incl. the new int4 prefix-logits gate)
# Results in /tmp/q5c_*.log, progress in /tmp/q5_driver.log.
set -u
cd /root/repo
echo $$ > /tmp/q5c.pid
trap 'rm -f /tmp/q5c.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

# bounded wait for part B (pid-recycling safe: verify the command line)
for i in $(seq 1 200); do
  pid=$(cat /tmp/q5b.pid 2>/dev/null) || break
  [ -n "$pid" ] || break
  grep -q tpu_queue_r5b "/proc/$pid/cmdline" 2>/dev/null || break
  sleep 60
done
note "part B done or absent; starting part C"

wait_tpu() {
  for i in $(seq 1 120); do
    if timeout 180 python -c "import jax,jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      note "tpu up (try $i)"; return 0
    fi
    sleep 180
  done
  note "tpu never came up"; return 1
}

run() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  : > "/tmp/q5c_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5c_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5c_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

wait_tpu || exit 1

run gain_g4 3600 python scripts/gain_ab.py --fixture v3 --clips 32 \
  --steps 2000 --bottlenecks vq --vq-groups 4 --eval-batches 16 \
  --workdir /tmp/gain_v3 --out /tmp/q5c_gain_g4.jsonl

run gain_g8 3600 python scripts/gain_ab.py --fixture v3 --clips 32 \
  --steps 2000 --bottlenecks vq --vq-groups 8 --eval-batches 16 \
  --workdir /tmp/gain_v3 --out /tmp/q5c_gain_g8.jsonl

GEN_INT4=1 GEN_SKIP_SCAN=1 run gen64_int4 1800 python scripts/bench_gen.py
GEN_BATCH=128 GEN_INT4=1 GEN_SKIP_SCAN=1 \
  run gen128_int4 1800 python scripts/bench_gen.py

run tests_tpu 5400 python -m pytest tests_tpu/ -q --no-header

note "queue C done"
