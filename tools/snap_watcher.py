"""Harvest proxy_latest.pt (written atomically every saveFreq epochs)
into epoch-named snapshot files, so matched-budget scoring has dense
snapshots without restarting the long-running proxy trainers."""
import os
import shutil
import sys
import time

DIRS = ["/root/repo/logs/proxy_headtohead", "/root/repo/logs/proxy_seed2"]

while True:
    for save in DIRS:
        try:
            latest = os.path.join(save, "proxy_latest.pt")
            if not os.path.exists(latest):
                continue
            # name the snapshot by the epoch stored INSIDE the checkpoint,
            # not the log's last epoch: the log line for epoch e lands
            # moments before proxy_latest.pt is replaced, so trusting the
            # log can snapshot the PREVIOUS checkpoint under e's name and
            # corrupt the matched-budget scoring
            m1 = os.path.getmtime(latest)
            time.sleep(3)
            if os.path.getmtime(latest) != m1:
                continue  # mid-replace; catch it on the next poll
            import torch
            tmp = os.path.join(save, "snap_watcher.tmp")
            shutil.copyfile(latest, tmp)
            e = int(torch.load(tmp, map_location="cpu",
                               weights_only=False)["epoch"])
            snap = os.path.join(save, f"proxy_ep{e:05d}.pt")
            if not e or e % 5 != 0 or os.path.exists(snap):
                os.remove(tmp)
                continue
            os.replace(tmp, snap)
            print(f"snapshotted {snap}", flush=True)
        except Exception as ex:
            print(f"watcher error {save}: {ex}", flush=True)
    time.sleep(60)
