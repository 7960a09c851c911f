#!/bin/bash
# Round-5 CFRM learning-evidence run at the 512px operating point
# (VERDICT r4 item 4; protocol built in r4, never executed — tunnel).
#
# Isolates the CFRM feature objective (TRAIN_FRENC_ONLY: cnet term off,
# frenc IS the total loss), makes lq a degraded hq (TRAIN_LQ_FROM_HQ:
# the reference's stage-1 pair semantics), fixes the batch + rng
# (TRAIN_FIXED_RNG: deterministic single-batch overfit), and first
# prints the no-CFRM feature-MSE floor (TRAIN_FRENC_BASELINE) that a
# learning adapter must descend below. Reference: engine_unifie.py:135-156.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r5_frenc.jsonl}
STEPS=${STEPS:-300}
env TRAIN_STAGE=1 TRAIN_FRENC_ONLY=1 TRAIN_FRENC_BASELINE=1 \
    TRAIN_LQ_FROM_HQ=1 TRAIN_FIXED_RNG=1 TRAIN_LOG_EVERY=10 \
    TRAIN_ITERS="$STEPS" \
    timeout 3600 python tools/bench_train.py 2>&1 | tee "$OUT"
