#!/usr/bin/env python
"""Autoencoder trainer CLI — rebuild of `th train_autoencoder.lua`
(flags train_autoencoder.lua:15-33; grayscale flat AE, L1 loss)."""

import sys

from facegen.config import train_config_from_args
from facegen.train.ae_loop import train_autoencoder


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference AE bottleneck default: 256 (train_autoencoder.lua:22)
    if not any(a.startswith("--noiseDim") for a in argv):
        argv += ["--noiseDim", "256"]
    cfg = train_config_from_args(argv)
    # reference AE defaults: grayscale, scale from --scale (default 32
    # there), noiseDim 256 (train_autoencoder.lua:22, 56-57)
    if not cfg.grayscale:
        import dataclasses

        cfg = dataclasses.replace(cfg, grayscale=True)
    from facegen.parallel import mesh2d_from_shape

    train_autoencoder(cfg, epochs=cfg.epochs if cfg.epochs > 0 else None,
                      mesh=mesh2d_from_shape(cfg.mesh_shape))


if __name__ == "__main__":
    main()
