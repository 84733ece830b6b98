#!/bin/bash
# Round-5 queue, part I (final): resumes all three 1024-clip arms
# 12k -> 24k steps.  Motivation: at 12k the 1024-clip three-way is ~16
# epochs — every arm's best holdout eval was still the second-to-last
# point, i.e. none had converged, while the 256-clip runs plateaued at
# ~37 epochs.  24k steps is ~32 epochs: the plateau region.  This (a)
# doubles the late-eval sample for the paired-CE statistic (n=40 in the
# late third), (b) tests whether G=4's ordering win over G=1 becomes a
# significant margin near convergence, and (c) gives the strongest
# near-converged at-scale conditioning-gain number the round can ship.
# HARD WALL: chip free by ~02:30 UTC for the driver bench.
set -u
cd /root/repo
echo $$ > /tmp/q5i.pid
trap 'rm -f /tmp/q5i.pid' EXIT

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
  : > "/tmp/q5i_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5i_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5i_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

CUTOFF=$(date -u -d "tomorrow 02:30" +%s 2>/dev/null || echo 0)
now=$(date -u +%s)
if [ "$CUTOFF" -gt $((now + 86400)) ]; then CUTOFF=$((CUTOFF - 86400)); fi
left() { echo $((CUTOFF - $(date -u +%s))); }

wait_tpu || exit 1

P1024=/tmp/scale1024/synth1024

if [ -d /tmp/scale1024/ckpt ] && [ "$(left)" -gt 9000 ]; then
  run vqg4_1024_24k 7200 python scripts/long_run.py --steps 24000 --clips 1024 \
    --speakers 32 --bottleneck vq --vq-groups 4 --fixture v2 \
    --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/scale1024 --resume \
    --out docs/long_run_r5_vqg4_1024.jsonl
else
  note "skipping vqg4_1024_24k: no ckpt or only $(left)s left"
fi

if [ -d /tmp/zero1024/ckpt ] && [ "$(left)" -gt 9000 ]; then
  run zero_1024_24k 7200 python scripts/long_run.py --steps 24000 --clips 1024 \
    --speakers 32 --bottleneck zero --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/zero1024 --resume \
    --out docs/long_run_r5_zero1024.jsonl
else
  note "skipping zero_1024_24k: no ckpt or only $(left)s left"
fi

if [ -d /tmp/vq1024g1/ckpt ] && [ "$(left)" -gt 9000 ]; then
  run vqg1_1024_24k 7200 python scripts/long_run.py --steps 24000 --clips 1024 \
    --speakers 32 --bottleneck vq --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/vq1024g1 --resume \
    --out docs/long_run_r5_vqg1_1024.jsonl
else
  note "skipping vqg1_1024_24k: no ckpt or only $(left)s left"
fi

note "queue I done"
