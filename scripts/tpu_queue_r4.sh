#!/bin/bash
# Round-4 on-chip queue (run top-down once the TPU tunnel returns).
# Self-healing: waits for the TPU first, retries each step once after a
# fresh wait.  Results in /tmp/q4_*.log, progress in /tmp/q4_driver.log.
#
# Order = evidence value per VERDICT.md round-3 "Next round":
#   1. tests_tpu gates at HEAD (item 5)
#   2. bench default w/ MFU + aux-weight A/B (items 5, 6)
#   3. 12k-step flagship run with mid-run resume + quality curve (item 2)
#   4. divergence report on the final checkpoint (item 3)
#   5. VAE flagship 2k-step health run (item 4)
#   6. vq_pallas K-sweep decision (item 9)
#   7. checkpoint save-pause on chip (item 8)
set -u
cd /root/repo

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
run tests_tpu     5400 python -m pytest tests_tpu/ -q
run bench_default 2700 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_aux0    2400 env BENCH_AUX_WEIGHT=0 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_aux1    2400 env BENCH_AUX_WEIGHT=1 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
# kernel-schedule A/Bs left unmeasured when the round-3 tunnel died:
# whole-stack forward fusion and grouped backward (flip defaults only if
# they win; comparable iters=10 like the aux A/B)
run bench_gated   3600 python scripts/bench_gated.py
run bench_ff      2400 env BENCH_FULL_FUSION=1 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_bg5     2400 env BENCH_BWD_GROUP=5 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_bg10    2400 env BENCH_BWD_GROUP=10 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
run bench_ff_bg5  2400 env BENCH_FULL_FUSION=1 BENCH_BWD_GROUP=5 BENCH_ITERS=10 env BENCH_REQUIRE_TPU=1 python bench.py
# 500-step XLA-vs-Pallas CE drift bound at current HEAD (incl. aux head)
run convergence   3600 python scripts/convergence_ab.py --steps 500
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
note "QUEUE4 DONE"
