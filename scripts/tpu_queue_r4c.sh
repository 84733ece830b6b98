#!/bin/bash
# Round-4 queue, part C: data-scaling evidence for the overfitting diagnosis.
# The 12k-step run on the 32-clip fixture (~500 epochs) showed holdout CE
# bottoming at step ~2,800 while train CE kept falling — measured
# generalization gap.  This run is the control: SAME config, 8x the data
# (256 clips / 16 speakers, ~37M train samples), 6k steps (~25 epochs).
# If holdout CE tracks train CE here, the NLL ceiling is data-limited,
# not a framework limit.  Waits for part B (q4b.pid) to finish first.
set -u
cd /root/repo

note() { echo "$* ($(date -u +%H:%M:%S))" | tee -a /tmp/q4c_driver.log; }

if [ -f /tmp/q4b.pid ]; then
  B=$(cat /tmp/q4b.pid)
  # bounded wait (24h) + the pid must still be the part-B shell: a reboot can
  # recycle the pid onto an unrelated long-lived process (advisor round 4)
  for i in $(seq 1 2880); do
    kill -0 "$B" 2>/dev/null || break
    grep -q tpu_queue_r4b "/proc/$B/cmdline" 2>/dev/null || break
    sleep 30
  done
  note "part B (pid $B) finished"
fi

wait_tpu() {
  for i in $(seq 1 60); do
    if timeout 180 python -c "import jax,jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      note "tpu up (try $i)"; return 0
    fi
    sleep 120
  done
  note "tpu never came up"; return 1
}

wait_tpu || exit 1
rm -rf /tmp/long_run_r4s; mkdir -p /tmp/long_run_r4s
note "=== scale_run start ==="
timeout 5400 python scripts/long_run.py --steps 6000 \
  --clips 256 --speakers 16 --workdir /tmp/long_run_r4s \
  --out docs/long_run_r4_scale.jsonl --quality-every 1000 \
  >> /tmp/q4c_scale.log 2>&1
note "exit=$? scale_run"
note "QUEUE4C DONE"
