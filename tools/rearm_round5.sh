#!/bin/bash
# ROUND 5 COMPLETE (2026-08-19 ~17:30 UTC): every background job below
# finished and its artifact is committed (seed_spread.json partial:false,
# quality_ceiling.json, ablation_convergence.json, parity_scale16.json v2,
# scale16 runs @ep20000, long run @ep10000). Nothing left to re-arm.
exit 0

# Re-arm round-5 background runs after a VM restart (PROGRESS notes show
# restarts silently kill nohup'd jobs). Safe to run repeatedly: every
# job either skips completed work or resumes from its latest snapshot.
cd /root/repo
alive() { [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; }

# 1) torch proxy continuation (seed 1 -> epoch 300), resumes from proxy_latest.pt
if ! alive /tmp/proxy_cont.pid; then
    nohup nice -n 10 python tools/train_torch_proxy.py \
        --store dataset/refgrid_aug32.npy --save logs/proxy_headtohead \
        --epochs 300 --seed 1 --resume > /tmp/proxy_cont.log 2>&1 &
    echo $! > /tmp/proxy_cont.pid; echo "re-armed proxy continuation"
fi
# 2) fresh torch proxy seed 2 -> epoch 100
if ! alive /tmp/proxy_s2.pid; then
    nohup nice -n 15 python tools/train_torch_proxy.py \
        --store dataset/refgrid_aug32.npy --save logs/proxy_seed2 \
        --epochs 100 --seed 2 --snapshotFreq 10 --resume \
        > /tmp/proxy_s2.log 2>&1 &
    echo $! > /tmp/proxy_s2.pid; echo "re-armed proxy seed2"
fi
# 3) snapshot watcher (harvests proxy_latest.pt -> proxy_epNNNNN.pt)
if ! alive /tmp/snap_watcher.pid; then
    if [ ! -f /tmp/snap_watcher.py ]; then
        cp tools/snap_watcher.py /tmp/snap_watcher.py 2>/dev/null || true
    fi
    nohup python /tmp/snap_watcher.py > /tmp/snap_watcher.log 2>&1 &
    echo $! > /tmp/snap_watcher.pid; echo "re-armed snap watcher"
fi
# 4) convergence ablations (skips completed variant/seed runs)
if ! alive /tmp/ablations.pid; then
    if [ ! -f docs/artifacts/ablation_convergence.json ]; then
        nohup python tools/run_ablations.py > /tmp/ablations.log 2>&1 &
        echo $! > /tmp/ablations.pid; echo "re-armed ablations"
    fi
fi
# 5) long-run quality-ceiling extension (resumes from latest snapshot)
if ! alive /tmp/fg_long10k.pid; then
    last=$(ls -d logs/facegen_h2h_long/adversarial_ep* 2>/dev/null |
           sed 's/.*_ep0*//' | sort -n | tail -1)
    if [ -n "$last" ] && [ "$last" -lt 10000 ]; then
        nohup python tools/train_facegen_headtohead.py \
            --store dataset/refgrid_aug32.npy --save logs/facegen_h2h_long \
            --epochs 10000 --snap 500 --resume-from "$last" \
            > /tmp/fg_long10k.log 2>&1 &
        echo $! > /tmp/fg_long10k.pid; echo "re-armed long-run extension @$last"
    fi
fi
# 5b) 16px route long run (resumes from latest snapshot)
if ! alive /tmp/scale16.pid; then
    last16=$(ls -d logs/scale16_r5/adversarial_ep* 2>/dev/null |
             sed 's/.*_ep0*//' | sort -n | tail -1)
    if [ -z "$last16" ] || [ "$last16" -lt 20000 ]; then
        nohup python tools/train_facegen_headtohead.py \
            --store dataset/refgrid64.npy --save logs/scale16_r5 \
            --epochs 20000 --snap 1000 --scale 16 --grayscale --augment \
            --dIterations 1 --dL2 1e-4 --seed 1 \
            ${last16:+--resume-from "$last16"} > /tmp/scale16.log 2>&1 &
        echo $! > /tmp/scale16.pid; echo "re-armed scale16 run @${last16:-0}"
    fi
fi
# 5c) 16px no-augment run (train/eval distribution match test; resumes)
if ! alive /tmp/scale16_noaug.pid; then
    lastna=$(ls -d logs/scale16_noaug/adversarial_ep* 2>/dev/null |
             sed 's/.*_ep0*//' | sort -n | tail -1)
    if [ -z "$lastna" ] || [ "$lastna" -lt 20000 ]; then
        nohup python tools/train_facegen_headtohead.py \
            --store dataset/refgrid16.npy --save logs/scale16_noaug \
            --epochs 20000 --snap 1000 --scale 16 --grayscale \
            --dIterations 1 --dL2 1e-4 --seed 1 \
            ${lastna:+--resume-from "$lastna"} > /tmp/scale16_noaug.log 2>&1 &
        echo $! > /tmp/scale16_noaug.pid
        echo "re-armed scale16 no-aug run @${lastna:-0}"
    fi
fi
# 6) seed-spread scorer (recomputes + flushes incrementally; cheap to redo)
if ! alive /tmp/spread_score.pid; then
    nohup python tools/seed_spread_report.py \
        --facegen logs/facegen_headtohead --facegen 'logs/fgspread_s*' \
        --proxy main=logs/proxy_headtohead --proxy seed2=logs/proxy_seed2 \
        --out docs/artifacts/seed_spread.json --n 2048 --merge \
        > /tmp/spread_score.log 2>&1 &
    echo $! > /tmp/spread_score.pid; echo "re-armed spread scorer (merge)"
fi
