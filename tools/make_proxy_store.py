"""Build the torch-proxy's training store: the reference's offline
data regime applied to the refgrid tiles.

The reference trains on a pre-augmented directory of JPEGs: for every
source image, 1 original + 19 random augmentations, written at 64x64
(generate_dataset.py:29-30,43-66), which dataset.lua then bilinearly
downscales to the training scale at load time (dataset.lua:90-95).

This script reproduces that regime for the head-to-head quality run:
  refgrid64.npy (1024 source tiles, 64x64x3 uint8; built by
  facegen.eval.refgrid from the reference's published
  images/color_random1024.jpg)
    -> 20,480 images = 1 original + 19 augmented copies per tile,
       augmented at 64px with the generate_dataset.py parameter family
       (facegen/data/augment.py AugmentConfig defaults), then
       downscaled to 32px and packed as (20480, 32, 32, 3) uint8.

Both the torch proxy (tools/train_torch_proxy.py) and any facegen
fixed-store run can then draw per-epoch random pools from the same
array — identical data, identical augmentation family.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build(grid: str, src_store: str, out: str, scale: int = 32,
          n_aug: int = 19, seed: int = 43) -> str:
    import jax
    import jax.numpy as jnp

    from facegen.data.augment import AugmentConfig, augment_batch
    from facegen.eval import refgrid

    if not os.path.exists(src_store):
        refgrid.build_store_from_grid(grid, src_store)
    raw = np.load(src_store)  # (N, 64, 64, 3) uint8
    n = raw.shape[0]
    dev = jnp.asarray(raw)

    @jax.jit
    def resize_u8(x):  # float [0,1] (N,64,64,3) -> uint8 (N,scale,scale,3)
        y = jax.image.resize(x, (n, scale, scale, 3), method="linear")
        return jnp.clip(y * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    cfg = AugmentConfig()  # = generate_dataset.py:43-48 parameters
    copies = [np.asarray(resize_u8(dev.astype(jnp.float32) / 255.0))]
    key = jax.random.key(seed)
    for a in range(n_aug):
        aug = augment_batch(jax.random.fold_in(key, a), dev, cfg)
        copies.append(np.asarray(resize_u8(aug)))
    packed = np.concatenate(copies, axis=0)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.save(out, packed)
    print(f"wrote {out}: {packed.shape} uint8")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid",
                   default="/root/reference/images/color_random1024.jpg")
    p.add_argument("--src", default="dataset/refgrid64.npy")
    p.add_argument("--out", default="dataset/refgrid_aug32.npy")
    p.add_argument("--scale", type=int, default=32)
    p.add_argument("--seed", type=int, default=43)
    args = p.parse_args(argv)
    build(args.grid, args.src, args.out, args.scale, seed=args.seed)


if __name__ == "__main__":
    main()
