#!/bin/bash
# Round-5 queue, part G: waits for queue F (pid file /tmp/q5f.pid), then
#   1. vq G=1 twin on the SAME 1024-clip fixture queue F built — completes
#      the at-scale three-way (zero / G=1 / G=4) and answers whether 4x
#      data changes the G=1-vs-G=4 ordering seen on 256 clips
#   2. bench.py sanity run (the driver re-runs it at round end; this
#      records an early-warning copy at /tmp/bench_r5_sanity.json)
# HARD WALL: the chip must be free when the round driver runs bench.py
# (~03:17 UTC Aug 20); CUTOFF leaves slack.
set -u
cd /root/repo
echo $$ > /tmp/q5g.pid
trap 'rm -f /tmp/q5g.pid' EXIT

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q5_driver.log; }

# wait for queue F (bounded: 4h)
for i in $(seq 1 240); do
  pid=$(cat /tmp/q5f.pid 2>/dev/null) || break
  [ -n "$pid" ] || break
  kill -0 "$pid" 2>/dev/null || break
  sleep 60
done
note "queue F done or absent; starting part G"

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
  : > "/tmp/q5g_${name}.log"
  for attempt in 1 2; do
    note "=== $name attempt $attempt ==="
    echo "--- attempt $attempt" >> "/tmp/q5g_${name}.log"
    timeout "$tmo" "$@" >> "/tmp/q5g_${name}.log" 2>&1
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
if [ -f "${P1024}.dat" ] && [ "$(left)" -gt 5400 ]; then
  run vqg1_1024 7200 python scripts/long_run.py --steps 6000 --clips 1024 \
    --speakers 32 --bottleneck vq --fixture v2 \
    --data "$P1024" --quality-every 2000 --ckpt-every 400 --ckpt-keep 2 \
    --workdir /tmp/vq1024g1 \
    --out docs/long_run_r5_vqg1_1024.jsonl
else
  note "skipping vqg1_1024: fixture absent or only $(left)s left"
fi

if [ "$(left)" -gt 1200 ]; then
  note "=== bench sanity ==="
  timeout 900 python bench.py > /tmp/bench_r5_sanity.json 2>/tmp/bench_r5_sanity.err
  note "exit=$? bench sanity"
else
  note "skipping bench sanity: only $(left)s left"
fi

note "queue G done"
