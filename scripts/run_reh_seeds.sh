#!/bin/bash
# Ours-side multi-seed variance runs for the round-4 de-saturated
# production-config rehearsal (PARITY.md round 4): natural flax init under
# jax.random.key(seed), 60 epochs, batch 16, full aug-replay, flagship,
# n_test 256, signal 3.0, ampnoise 18 — the mirror of the reference-side
# 5-seed baseline (seed 0 ours already recorded by the matched run).
# Usage: bash scripts/run_reh_seeds.sh [seeds...]   (default: 1 2 3 4)
set -u
cd "$(dirname "$0")/.."
for s in "${@:-1 2 3 4}"; do
  for seed in $s; do
    echo "=== ours seed $seed $(date +%T) ===" >> /tmp/reh_seeds.log
    OAPROG_REH_SIDE=ours \
    OAPROG_REH_SEED=$seed \
    OAPROG_REH_SIGNAL=3.0 \
    OAPROG_REH_AMPNOISE=18.0 \
    OAPROG_REH_BATCH=16 \
    OAPROG_REH_NTEST=256 \
    OAPROG_REH_BACKEND=tpu \
    OAPROG_REH_OUT=/root/repo/rehearsal_r04_results.jsonl \
    python scripts/rehearse_training_parity.py 60 flagship aug \
      >> /tmp/reh_seeds.log 2>&1
    echo "=== seed $seed exit $? $(date +%T) ===" >> /tmp/reh_seeds.log
  done
done
