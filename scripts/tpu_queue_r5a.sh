#!/bin/bash
# Round-5 queue, part A: the gating measurements.
#  1. conditioning-gain A/B on the v3 (hard) fixture, flagship dims,
#     zero/ae/vq twins — gates the round's headline experiment
#  2. MFCC frontend on-chip (BASELINE target row 3, open since round 4)
#  3. v2 256-clip ZERO twin, 6k steps — the missing control for the
#     round-4 data-scaling run (VQ best holdout CE 2.40 @ 5600)
# Results in /tmp/q5_*.log, progress in /tmp/q5_driver.log.
set -u
cd /root/repo
echo $$ > /tmp/q5a.pid
trap 'rm -f /tmp/q5a.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

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
  : > "/tmp/q5_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

wait_tpu || exit 1

run gain_v3 3600 python scripts/gain_ab.py --fixture v3 --clips 32 \
  --steps 2000 --bottlenecks zero,ae,vq --eval-batches 16 \
  --workdir /tmp/gain_v3 --out /tmp/q5_gain_v3.jsonl

run mfcc 900 python scripts/bench_mfcc.py

run zero256 3600 python scripts/long_run.py --steps 6000 --clips 256 \
  --speakers 16 --bottleneck zero --fixture v2 --quality-every 2000 \
  --ckpt-keep 2 --workdir /tmp/zero256 --out /tmp/q5_zero256.jsonl

note "queue A done"
