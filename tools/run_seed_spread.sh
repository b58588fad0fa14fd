#!/bin/bash
# Round-5 seed spread (VERDICT round-4 task 1b): train a 20-seed facegen
# population on the shared head-to-head store under the reference's
# published-images config, so the matched-budget quality comparison tests
# the proxy against facegen's seed DISTRIBUTION instead of 6 samples.
# Seed 1 is the existing logs/facegen_headtohead main run (snap 10);
# seeds 2..20 land in logs/fgspread_s<N>. Fail-fast per run.
set -e
EPOCHS="${EPOCHS:-120}"
SNAP="${SNAP:-10}"
for s in $(seq 2 20); do
    python tools/train_facegen_headtohead.py \
        --store dataset/refgrid_aug32.npy \
        --save "logs/fgspread_s${s}" \
        --epochs "$EPOCHS" --snap "$SNAP" --seed "$s" || exit 1
    echo "[spread] seed $s done"
done
echo "[spread] all seeds done"
