#!/bin/bash
# Round-5 queue, part B (relaunched without the 4k gain run — tunnel outage killed it in-flight;
# the 2k-protocol grouped-VQ arms live in part C instead):
#  1. grouped-VQ conditioning gain on v3, 4k steps (ceiling 4*ln512*50/16k
#     = 0.078 nats) — does VQ gain scale with its information ceiling?
#  2. flagship VQ 256-clip retrain, 6k steps, retention keep-best — regains
#     the best checkpoint (reboot wiped round 4's) for divergence work
#  3. fine-grained divergence on that best checkpoint (16-sample buckets
#     over the first 512 samples, then 64-sample over 2048) — VERDICT #3
#  4. VAE 256-clip run with quality probes + divergence — VERDICT #6
#  5. batch-128 fused sampler (int8 + bf16) — VERDICT #7 first half
# Results in /tmp/q5b_*.log, progress in /tmp/q5_driver.log.
set -u
cd /root/repo
echo $$ > /tmp/q5b.pid
trap 'rm -f /tmp/q5b.pid' EXIT

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
  : > "/tmp/q5b_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5b_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5b_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

wait_tpu || exit 1


run vq256 3600 python scripts/long_run.py --steps 6000 --clips 256 \
  --speakers 16 --bottleneck vq --fixture v2 --quality-every 2000 \
  --ckpt-every 400 --ckpt-keep 3 --workdir /tmp/vq256 \
  --out /tmp/q5b_vq256.jsonl

run div_fine 1800 python scripts/eval_quality.py \
  --ckpt-dir /tmp/vq256/ckpt --step best --data /tmp/vq256/synth256 \
  --clips 0,5,10,15 --divergence --n-samples 512 --nll-buckets 32 \
  --json /tmp/q5b_div_fine.jsonl

run div_mid 1800 python scripts/eval_quality.py \
  --ckpt-dir /tmp/vq256/ckpt --step best --data /tmp/vq256/synth256 \
  --clips 0,5,10,15 --divergence --n-samples 2048 --nll-buckets 32 \
  --json /tmp/q5b_div_mid.jsonl

run vae256 3600 python scripts/long_run.py --steps 6000 --clips 256 \
  --speakers 16 --bottleneck vae --fixture v2 --quality-every 2000 \
  --ckpt-every 400 --ckpt-keep 3 --workdir /tmp/vae256 \
  --out /tmp/q5b_vae256.jsonl

run div_vae 1800 python scripts/eval_quality.py \
  --ckpt-dir /tmp/vae256/ckpt --step best --data /tmp/vae256/synth256 \
  --clips 0,5,10,15 --divergence --n-samples 2048 --nll-buckets 32 \
  --json /tmp/q5b_div_vae.jsonl

GEN_BATCH=128 GEN_INT8=1 GEN_SKIP_SCAN=1 \
  run gen128_int8 1800 python scripts/bench_gen.py
GEN_BATCH=128 GEN_SKIP_SCAN=1 \
  run gen128_bf16 1800 python scripts/bench_gen.py

note "queue B done"
