#!/bin/bash
# Round-5 batch-32 train probes (VERDICT r4 #3 / TODO #3): chunked
# "NbK" remat configs queued in round 4, run through the production
# train step (stage C only — one remote compile per config). Each probe
# either prints a C-stage ms/step JSON line or dies with the XLA OOM
# report (captured verbatim: the HBM excess is the datum).
# Usage: bash scripts/run_b32_probes.sh [batch] >> /tmp/b32_probes.log
set -u
cd "$(dirname "$0")/.."
BATCH="${1:-32}"
CONFIGS=(
  "0b,1b2,2,3"
  "0b2,1b2,2,3"
  "0b,1b2,2b2,3"
  "s,0b,1b2,2,3"
  "s,0b2,1b2,2,3"
)
for cfg in "${CONFIGS[@]}"; do
  echo "=== OAPROG_FE_REMAT=$cfg batch=$BATCH $(date +%T) ==="
  OAPROG_BENCH_TRAIN_STAGES=C OAPROG_FE_REMAT="$cfg" \
    timeout 2700 python scripts/bench_train_step.py "$BATCH" 4 2>&1 \
    | grep -iE "stage|knees|RESOURCE|exhaust|attempting|reserve|alloc|error" \
    | head -30
  echo "=== exit ${PIPESTATUS[0]:-?} ==="
done
