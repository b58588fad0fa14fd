#!/usr/bin/env python
"""Denoiser trainer CLI — rebuild of `th train_denoiser.lua`
(flags train_denoiser.lua:22-37; two-stage denoising AE whose AE1
decoder feeds train.py's --denoise hook). Default scale 16 like the
reference (train_denoiser.lua:34)."""

import sys

from facegen.config import train_config_from_args
from facegen.train.ae_loop import train_denoiser


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--scale") for a in argv):
        argv += ["--scale", "16"]
    cfg = train_config_from_args(argv)
    from facegen.parallel import mesh2d_from_shape

    train_denoiser(cfg, epochs=cfg.epochs if cfg.epochs > 0 else None,
                   mesh=mesh2d_from_shape(cfg.mesh_shape))


if __name__ == "__main__":
    main()
