#!/bin/bash
# Round-5 queue, part H: waits for queue G (pid file /tmp/q5g.pid), then
# resumes all three 1024-clip arms 6k -> 12k.  Motivation: on the 256-clip
# corpus the story CHANGED between 6k and 12k (G=4's CE deficit vs G=1
# proved transient, and its free-running spectral win only emerged from
# step 8k on) — the matched-12k three-way at 4x the data is the strongest
# at-scale statement the round can make.
# HARD WALL: chip free by ~02:30 UTC for the driver bench.
set -u
cd /root/repo
echo $$ > /tmp/q5h.pid
trap 'rm -f /tmp/q5h.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

# wait for queue G (bounded: 5h)
for i in $(seq 1 300); do
  pid=$(cat /tmp/q5g.pid 2>/dev/null) || break
  [ -n "$pid" ] || break
  kill -0 "$pid" 2>/dev/null || break
  sleep 60
done
note "queue G done or absent; starting part H"

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
  : > "/tmp/q5h_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5h_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5h_${name}.log" 2>&1
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

if [ -d /tmp/scale1024/ckpt ] && [ "$(left)" -gt 5400 ]; then
  run vqg4_1024_12k 7200 python scripts/long_run.py --steps 12000 --clips 1024 \
    --speakers 32 --bottleneck vq --vq-groups 4 --fixture v2 \
    --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/scale1024 --resume \
    --out docs/long_run_r5_vqg4_1024.jsonl
else
  note "skipping vqg4_1024_12k: no ckpt or only $(left)s left"
fi

if [ -d /tmp/zero1024/ckpt ] && [ "$(left)" -gt 5400 ]; then
  run zero_1024_12k 7200 python scripts/long_run.py --steps 12000 --clips 1024 \
    --speakers 32 --bottleneck zero --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/zero1024 --resume \
    --out docs/long_run_r5_zero1024.jsonl
else
  note "skipping zero_1024_12k: no ckpt or only $(left)s left"
fi

if [ -d /tmp/vq1024g1/ckpt ] && [ "$(left)" -gt 5400 ]; then
  run vqg1_1024_12k 7200 python scripts/long_run.py --steps 12000 --clips 1024 \
    --speakers 32 --bottleneck vq --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/vq1024g1 --resume \
    --out docs/long_run_r5_vqg1_1024.jsonl
else
  note "skipping vqg1_1024_12k: no ckpt or only $(left)s left"
fi

note "queue H done"
