"""Round-5 seed spread driver (VERDICT round-4 task 1b): train the
facegen seed population for the matched-budget head-to-head in ONE
process, so jax import/backend-attach is paid once instead of per seed
(the box's single CPU core is shared with the torch-proxy trainers).

Seed 1 = the existing logs/facegen_headtohead run; this trains seeds
--first..--last into logs/fgspread_s<N> via the same config path as
tools/train_facegen_headtohead.py (which it invokes in-process).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import train_facegen_headtohead as h2h


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--first", type=int, default=2)
    p.add_argument("--last", type=int, default=20)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--snap", type=int, default=10)
    args = p.parse_args()
    for s in range(args.first, args.last + 1):
        save = f"logs/fgspread_s{s}"
        done_marker = os.path.join(save, f"adversarial_ep{args.epochs:05d}")
        if os.path.isdir(done_marker):
            print(f"[spread] seed {s} already complete, skipping", flush=True)
            continue
        t0 = time.time()
        h2h.main([
            "--store", "dataset/refgrid_aug32.npy",
            "--save", save,
            "--epochs", str(args.epochs),
            "--snap", str(args.snap),
            "--seed", str(s),
        ])
        print(f"[spread] seed {s} done in {time.time()-t0:.0f}s", flush=True)
    print("[spread] all seeds done", flush=True)


if __name__ == "__main__":
    main()
