#!/bin/bash
# Bootstrappable-regime cycle experiment (VERDICT r4 item 1): run the
# cycles-vs-control A/B at a paired count whose supervised warm-up reaches
# dev PER <= ~0.5 before the cycles engage (the reference's own operating
# point: 594 paired warm-start before 54k unpaired kick in,
# config/semi-single-spkr-paired-data.yaml). One seed per invocation of
# tools/cycle_check.py; results land as JSON files for aggregation.
#
# Usage: bash tools/bootstrap_experiment.sh OUTDIR N_PAIRED N_UNPAIRED STEPS START_STEP SEED...
set -u
OUT=$1; NP=$2; NU=$3; STEPS=$4; START=$5; shift 5
# absolutize OUT from the CALLER's cwd before cd'ing to the repo root —
# otherwise a relative OUTDIR is created in one directory and written to
# in another
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)
cd "$(dirname "$0")/.."
for SEED in "$@"; do
  f="$OUT/cycles_np${NP}_s${SEED}.json"
  if [ -s "$f" ]; then echo "[skip] $f exists"; continue; fi
  echo "[run] n_paired=$NP seed=$SEED steps=$STEPS start=$START -> $f"
  timeout 14400 python tools/cycle_check.py \
    --steps "$STEPS" --start-step "$START" --valid-step 500 \
    --n-paired "$NP" --n-unpaired "$NU" --pin-shapes --seed "$SEED" \
    --json-out "$f" 2>"$OUT/cycles_np${NP}_s${SEED}.log"
  echo "[done] seed=$SEED rc=$?"
done
