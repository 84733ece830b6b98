#!/bin/bash
# Round-5 queue, part D (waits for part C to exit):
#  1. resume BOTH 256-clip twins (vq + zero) 6k -> 12k steps — matched-
#     budget conditioning gain at 2x budget (holdout CE was still falling
#     at 6k in both)
#  2. VAE gain arm at the 2k v3 protocol (completes the bottleneck family
#     in the gain table)
#  3. quality_quantized gate on the vq256 best checkpoint (bf16/int8/int4)
#  4. fine-grained divergence refresh on the (possibly new) 12k best
# Results in /tmp/q5d_*.log, progress in /tmp/q5_driver.log.
set -u
cd /root/repo
echo $$ > /tmp/q5d.pid
trap 'rm -f /tmp/q5d.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

for i in $(seq 1 240); do
  pid=$(cat /tmp/q5c.pid 2>/dev/null) || break
  [ -n "$pid" ] || break
  grep -q tpu_queue_r5c "/proc/$pid/cmdline" 2>/dev/null || break
  sleep 60
done
note "part C done or absent; starting part D"

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
  : > "/tmp/q5d_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5d_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5d_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

wait_tpu || exit 1

run gain_vae 3600 python scripts/gain_ab.py --fixture v3 --clips 32 \
  --steps 2000 --bottlenecks vae --eval-batches 16 \
  --workdir /tmp/gain_v3 --out /tmp/q5d_gain_vae.jsonl

run qquant 2400 python scripts/quality_quantized.py \
  --ckpt-dir /tmp/vq256/ckpt --step best --data /tmp/vq256/synth256 \
  --clips 0,5,10,15 --json /tmp/q5d_qquant.jsonl

run vq256b 3600 python scripts/long_run.py --steps 12000 --clips 256 \
  --speakers 16 --bottleneck vq --fixture v2 --quality-every 2000 \
  --ckpt-every 400 --ckpt-keep 3 --workdir /tmp/vq256 \
  --out /tmp/q5d_vq256b.jsonl --resume

run zero256b 3600 python scripts/long_run.py --steps 12000 --clips 256 \
  --speakers 16 --bottleneck zero --fixture v2 --quality-every 2000 \
  --ckpt-keep 2 --workdir /tmp/zero256 \
  --out /tmp/q5d_zero256b.jsonl --resume

run div_fine12k 1800 python scripts/eval_quality.py \
  --ckpt-dir /tmp/vq256/ckpt --step best --data /tmp/vq256/synth256 \
  --clips 0,5,10,15 --divergence --n-samples 512 --nll-buckets 32 \
  --json /tmp/q5d_div_fine12k.jsonl

note "queue D done"
