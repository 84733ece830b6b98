#!/bin/bash
# Round-5 queue, part F (extended-session overnight): waits for the G=4
# 6k-step scale run (pid file /tmp/vqg4.pid), then
#   1. on-chip green record for the three prefix-logit gates (the shared
#      helper changed to inclusive-prefix comparison in 10b47a9)
#   2. resume the G=4 256-clip run 6k -> 12k (matched-12k three-way table
#      vs the vq256/zero256 twins)
#   3. 1024-clip data-scaling twins: VQ G=4 vs zero, 6k steps each on a
#      fresh synth1024 fixture (does the conditioning gain grow with 4x
#      the data, where overfitting pressure is 4x lower?)
# Outputs go straight to docs/ so partial runs still land in the final
# commit.  HARD WALL: nothing may hold the chip when the round driver
# runs bench.py (~03:17 UTC Aug 20); CUTOFF leaves ~45 min of slack.
set -u
cd /root/repo
echo $$ > /tmp/q5f.pid
trap 'rm -f /tmp/q5f.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

# wait for the 6k G=4 run (bounded: 3h)
for i in $(seq 1 180); do
  pid=$(cat /tmp/vqg4.pid 2>/dev/null) || break
  [ -n "$pid" ] || break
  grep -q long_run "/proc/$pid/cmdline" 2>/dev/null || break
  sleep 60
done
note "vqg4 6k done or absent; starting part F"

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
  : > "/tmp/q5f_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5f_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5f_${name}.log" 2>&1
    rc=$?
    note "exit=$rc $name"
    [ "$rc" -eq 0 ] && return 0
    wait_tpu || return 1
  done
  return "$rc"
}

CUTOFF=$(date -u -d "tomorrow 02:30" +%s 2>/dev/null || echo 0)
# if launched after midnight, "tomorrow 02:30" overshoots by a day
now=$(date -u +%s)
if [ "$CUTOFF" -gt $((now + 86400)) ]; then CUTOFF=$((CUTOFF - 86400)); fi
left() { echo $((CUTOFF - $(date -u +%s))); }

wait_tpu || exit 1

# 1. prefix-logit gates (bf16 + int8 + int4) after the inclusive-prefix fix
run prefix_gates 2400 python -m pytest \
  "tests_tpu/test_pallas_tpu.py::test_compiled_logits_match_scan_prefix_bf16" \
  "tests_tpu/test_pallas_tpu.py::test_compiled_logits_match_scan_prefix_int8" \
  "tests_tpu/test_pallas_tpu.py::test_compiled_logits_match_scan_prefix_int4" \
  -q --no-header

# 2. G=4 6k -> 12k resume (same flags as the 6k leg + --resume)
if [ "$(left)" -gt 4500 ]; then
  run vqg4_12k 7200 python scripts/long_run.py --steps 12000 --clips 256 \
    --speakers 16 --bottleneck vq --vq-groups 4 --fixture v2 \
    --data /tmp/vq256/synth256 --quality-every 2000 \
    --ckpt-every 400 --ckpt-keep 3 --workdir /tmp/vqg4_256 --resume \
    --out docs/long_run_r5_vqg4_256.jsonl
else
  note "skipping vqg4_12k: only $(left)s left"
fi

# 3. 1024-clip data-scaling twins (fixture built once by the first run;
#    the zero twin reuses it via --data).  ~25-30 min each + fixture gen.
P1024=/tmp/scale1024/synth1024
if [ "$(left)" -gt 7200 ]; then
  run vqg4_1024 7200 python scripts/long_run.py --steps 6000 --clips 1024 \
    --speakers 32 --bottleneck vq --vq-groups 4 --fixture v2 \
    --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/scale1024 \
    --out docs/long_run_r5_vqg4_1024.jsonl
else
  note "skipping vqg4_1024: only $(left)s left"
fi
if [ -f "${P1024}.dat" ] && [ "$(left)" -gt 4500 ]; then
  run zero_1024 7200 python scripts/long_run.py --steps 6000 --clips 1024 \
    --speakers 32 --bottleneck zero --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/zero1024 \
    --out docs/long_run_r5_zero1024.jsonl
else
  note "skipping zero_1024: fixture absent or only $(left)s left"
fi

note "queue F done"
