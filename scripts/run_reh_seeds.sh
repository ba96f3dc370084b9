#!/bin/bash
# Ours-side multi-seed variance runs for the round-4 de-saturated
# production-config rehearsal (PARITY.md round 4): natural flax init under
# jax.random.key(seed), 60 epochs, batch 16, full aug-replay, flagship,
# n_test 256, signal 3.0, ampnoise 18 — the mirror of the reference-side
# 5-seed baseline (seed 0 ours already recorded by the matched run).
#
# Each seed appends one JSONL row to its own per-seed file
# (rehearsal_r05_ours_s<seed>.jsonl) so re-runs overwrite-by-filename
# instead of duplicating rows in a shared log. A non-zero exit aborts the
# whole sweep with a prominent FAILURE marker in the log.
#
# OAPROG_REH_SAVE_DIR (optional): dump each seed's final train state to
# $OAPROG_REH_SAVE_DIR/rehearsal_state_s<seed>.msgpack for offline quant
# sweeps (scripts/exp_quant_auroc.py).
# Usage: bash scripts/run_reh_seeds.sh [seeds...]   (default: 1 2 3 4)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/reh_seeds.log
for s in "${@:-1 2 3 4}"; do
  for seed in $s; do
    out="/root/repo/rehearsal_r05_ours_s${seed}.jsonl"
    : > "$out"
    save=""
    if [ -n "${OAPROG_REH_SAVE_DIR:-}" ]; then
      save="${OAPROG_REH_SAVE_DIR}/rehearsal_state_s${seed}.msgpack"
    fi
    echo "=== ours seed $seed start $(date +%T) ===" >> "$LOG"
    OAPROG_REH_SIDE=ours \
    OAPROG_REH_SEED=$seed \
    OAPROG_REH_SIGNAL=3.0 \
    OAPROG_REH_AMPNOISE=18.0 \
    OAPROG_REH_BATCH=16 \
    OAPROG_REH_NTEST=256 \
    OAPROG_REH_BACKEND=${OAPROG_REH_BACKEND:-tpu} \
    OAPROG_REH_OUT="$out" \
    OAPROG_REH_SAVE="$save" \
    python scripts/rehearse_training_parity.py 60 flagship aug \
      >> "$LOG" 2>&1
    rc=$?
    echo "=== seed $seed exit $rc $(date +%T) ===" >> "$LOG"
    if [ "$rc" -ne 0 ]; then
      echo "=== FAILURE: seed $seed exited $rc — aborting sweep ===" >> "$LOG"
      exit "$rc"
    fi
  done
done
echo "=== sweep complete $(date +%T) ===" >> "$LOG"
