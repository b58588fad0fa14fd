#!/bin/bash
# Round-5 continuation: serial proxy-training chain (one CPU core, so
# jobs run back-to-back, not in parallel).
#   1. wait for the in-flight seed2 -> ep100 run (pid in /tmp/proxy_s2.pid)
#   2. seed1 (logs/proxy_headtohead) ep104 -> ep120
#   3. seed2 ep100 -> ep120
# Extends the matched-budget head-to-head to the 110k/120k budgets the
# 20-seed facegen spread already has snapshots for (fgspread_s*/ep00110,
# ep00120). Safe to re-run: --resume skips completed epochs.
set -u
cd /root/repo

if [ -f /tmp/proxy_s2.pid ] && kill -0 "$(cat /tmp/proxy_s2.pid)" 2>/dev/null; then
    echo "waiting for seed2->ep100 (pid $(cat /tmp/proxy_s2.pid))"
    while kill -0 "$(cat /tmp/proxy_s2.pid)" 2>/dev/null; do sleep 60; done
fi
echo "seed2->ep100 done; starting seed1->ep120"

nice -n 15 python tools/train_torch_proxy.py \
    --store dataset/refgrid_aug32.npy --save logs/proxy_headtohead \
    --epochs 120 --seed 1 --snapshotFreq 10 --resume \
    >> /tmp/proxy_s1_120.log 2>&1
echo "seed1->ep120 done; starting seed2->ep120"

nice -n 15 python tools/train_torch_proxy.py \
    --store dataset/refgrid_aug32.npy --save logs/proxy_seed2 \
    --epochs 120 --seed 2 --snapshotFreq 10 --resume \
    >> /tmp/proxy_s2_120.log 2>&1
echo "chain complete"
