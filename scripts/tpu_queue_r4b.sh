#!/bin/bash
# Round-4 queue, part B: the items the host reboot interrupted.
# (Part A — tests_tpu, bench + aux/schedule A/Bs, convergence — completed
# and is recorded in BASELINE.md "Round-4 on-chip evidence".)
# Results in /tmp/q4_*.log, progress in /tmp/q4_driver.log.
set -u
cd /root/repo
echo $$ > /tmp/q4b.pid   # part C (tpu_queue_r4c.sh) gates on this
trap 'rm -f /tmp/q4b.pid' EXIT  # a stale pid file could be recycled by an
                                # unrelated process; part C would wait forever

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q4_driver.log; }

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
  : > "/tmp/q4_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q4_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q4_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ $rc -eq 0 ] && return 0
    [ $attempt -eq 2 ] && break
    wait_tpu || return 1
  done
  return $rc
}

wait_tpu || exit 1
# 12k-step flagship in two halves -> on-chip mid-run resume is exercised
rm -rf /tmp/long_run_r4; mkdir -p /tmp/long_run_r4
run long_a        5400 python scripts/long_run.py --steps 6000 \
  --workdir /tmp/long_run_r4 --out docs/long_run_r4.jsonl --quality-every 1000
run long_b        5400 python scripts/long_run.py --steps 12000 --resume \
  --workdir /tmp/long_run_r4 --out docs/long_run_r4.jsonl --quality-every 1000
run divergence    3600 python scripts/eval_quality.py --divergence \
  --ckpt-dir /tmp/long_run_r4/ckpt --data /tmp/long_run_r4/synth32 \
  --clips 0 --n-samples 16000 --json docs/divergence_r4.jsonl
run vae_flagship  7200 python scripts/diag_vae.py --steps 2000 \
  --preset flagship --aux-weight 1.0 --workdir /tmp/long_run_r4 \
  --json docs/vae_run_r4.jsonl
run vq_ksweep     3600 python scripts/bench_vq.py
run ckpt_pause    1800 python scripts/bench_ckpt.py --flagship
note "QUEUE4B DONE"
