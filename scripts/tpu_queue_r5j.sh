#!/bin/bash
# Round-5 queue, part J (final chip work): a 2048-clip / 64-speaker
# three-way at the matched 12k-step protocol — the THIRD point on the
# "teacher-forced conditioning gain grows with corpus size" curve
# (256: noise-level; 1024: +0.019/+0.022 at 2-3.4 sigma; 2048: ?).
# Arms are run zero -> G4 first (the paired-gain statistic needs both)
# then G1 if the wall allows.  Fixture is pre-built by the session at
# /tmp/scale2048/synth2048 (same generator, seed=11, clip_len 120-240k,
# style v2 — only clips/speakers scaled: 2048/64, keeping the 1024
# corpus's 32 clips-per-speaker ratio).
# HARD WALL: chip free by ~02:30 UTC for the driver bench.
set -u
cd /root/repo
echo $$ > /tmp/q5j.pid
trap 'rm -f /tmp/q5j.pid' EXIT

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

CUTOFF=$(date -u -d "tomorrow 02:30" +%s 2>/dev/null || echo 0)
now=$(date -u +%s)
if [ "$CUTOFF" -gt $((now + 86400)) ]; then CUTOFF=$((CUTOFF - 86400)); fi
left() { echo $((CUTOFF - $(date -u +%s))); }

run() { # name timeout min_left cmd...
  local name=$1 tmo=$2 need=$3 rc; shift 3
  : > "/tmp/q5j_${name}.log"
  for attempt in 1 2; do
    if [ "$(left)" -lt "$need" ]; then
      note "skipping $name attempt $attempt: only $(left)s before the wall"
      return 1
    fi
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5j_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5j_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

# chain after queue I (bounded wait; verify the pid really is queue I —
# round-4 advisor: a recycled pid must not stall the chain forever)
for i in $(seq 1 80); do
  pid=$(cat /tmp/q5i.pid 2>/dev/null) || { note "queue I pid file gone"; break; }
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then break; fi
  grep -q "tpu_queue_r5i" "/proc/$pid/cmdline" 2>/dev/null || { note "pid $pid is not queue I; proceeding"; break; }
  sleep 180
done
note "queue I done or absent; starting part J"

wait_tpu || exit 1

P2048=/tmp/scale2048/synth2048
if [ ! -f "${P2048}.idx.json" ] && [ ! -f "${P2048}_index.json" ]; then
  ls "${P2048}"* >/dev/null 2>&1 || note "WARNING: 2048 fixture not pre-built; long_run will build it"
fi

run zero_2048 4500 5000 python scripts/long_run.py --steps 12000 --clips 2048 \
  --speakers 64 --bottleneck zero --fixture v2 \
  --data "$P2048" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
  --workdir /tmp/zero2048 \
  --out docs/long_run_r5_zero2048.jsonl

run vqg4_2048 4500 5000 python scripts/long_run.py --steps 12000 --clips 2048 \
  --speakers 64 --bottleneck vq --vq-groups 4 --fixture v2 \
  --data "$P2048" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
  --workdir /tmp/vq2048g4 \
  --out docs/long_run_r5_vqg4_2048.jsonl

run vqg1_2048 4500 5000 python scripts/long_run.py --steps 12000 --clips 2048 \
  --speakers 64 --bottleneck vq --fixture v2 \
  --data "$P2048" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
  --workdir /tmp/vq2048g1 \
  --out docs/long_run_r5_vqg1_2048.jsonl

if [ "$(left)" -gt 1500 ]; then
  note "=== bench sanity (final) ==="
  timeout 1200 env BENCH_REQUIRE_TPU=1 python bench.py > /tmp/bench_r5_final_sanity.json 2>/tmp/bench_r5_final_sanity.err
  note "exit=$? bench sanity"
else
  note "skipping final bench sanity: only $(left)s left"
fi

note "queue J done"
