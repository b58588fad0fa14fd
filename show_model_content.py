#!/usr/bin/env python
"""Checkpoint inspector — rebuild of `th show_model_content.lua`
(show_model_content.lua:10-23): prints the epoch, saved config and the
parameter tree summary of a checkpoint directory."""

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="inspect a facegen checkpoint")
    p.add_argument("--save", default="logs", help="checkpoint parent dir")
    p.add_argument("--network", default="adversarial", help="checkpoint name")
    args = p.parse_args(argv)
    # accept both --network NAME (joined with --save, like train.py) and
    # --network dir/name as the other CLIs do (models/gan.py:restore_gan)
    target = (args.network if os.path.isdir(args.network)
              else os.path.join(args.save, args.network))
    with open(os.path.join(target, "meta.json")) as f:
        meta = json.load(f)
    print(f"checkpoint: {target}")
    print(f"epoch: {meta.get('epoch')}")
    if "config" in meta:
        print("config (OPT equivalent):")
        for k, v in sorted(meta["config"].items()):
            print(f"  {k} = {v}")
    with np.load(os.path.join(target, "arrays.npz")) as z:
        total = 0
        groups = {}
        for k in z.files:
            arr = z[k]
            top = k.split("/")[0]
            g = groups.setdefault(top, [0, 0])
            g[0] += 1
            g[1] += arr.size
            total += arr.size
        print(f"arrays: {len(z.files)} leaves, {total:,} scalars")
        for top, (n, sz) in sorted(groups.items()):
            print(f"  {top}: {n} leaves, {sz:,} scalars")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        import sys

        sys.exit(0)
