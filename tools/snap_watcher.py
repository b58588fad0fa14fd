"""Harvest proxy_latest.pt (written atomically every saveFreq epochs)
into epoch-named snapshot files, so matched-budget scoring has dense
snapshots without restarting the long-running proxy trainers."""
import json
import os
import shutil
import sys
import time

DIRS = ["/root/repo/logs/proxy_headtohead", "/root/repo/logs/proxy_seed2"]

def last_epoch(save):
    path = os.path.join(save, "train_log.jsonl")
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            try:
                last = json.loads(line)["epoch"]
            except Exception:
                pass
    return last

while True:
    for save in DIRS:
        try:
            latest = os.path.join(save, "proxy_latest.pt")
            if not os.path.exists(latest):
                continue
            e = last_epoch(save)
            if not e or e % 5 != 0:
                continue
            snap = os.path.join(save, f"proxy_ep{e:05d}.pt")
            if os.path.exists(snap):
                continue
            # proxy_latest is written (atomic os.replace) right after the
            # log line for epoch e; wait until its mtime is stable
            m1 = os.path.getmtime(latest)
            time.sleep(3)
            if os.path.getmtime(latest) != m1:
                continue
            tmp = snap + ".tmp"
            shutil.copyfile(latest, tmp)
            os.replace(tmp, snap)
            print(f"snapshotted {snap}", flush=True)
        except Exception as ex:
            print(f"watcher error {save}: {ex}", flush=True)
    time.sleep(60)
