#!/usr/bin/env python
"""Coarse-to-fine refinement GAN trainer CLI — rebuild of
`th train_c2f.lua` (train_c2f.lua:16-46; deprecated in the reference per
README.md:170 but fully supported here)."""

import argparse

from facegen.config import C2FConfig
from facegen.train.c2f import C2FTrainer


def main(argv=None):
    p = argparse.ArgumentParser(description="facegen c2f trainer")
    p.add_argument("--save", default="logs")
    p.add_argument("--saveFreq", type=int, default=30, dest="save_freq")
    p.add_argument("--network", default="")
    p.add_argument("--noplot", action="store_true")
    p.add_argument("--D_sgd_lr", type=float, default=0.02, dest="d_sgd_lr")
    p.add_argument("--G_sgd_lr", type=float, default=0.02, dest="g_sgd_lr")
    p.add_argument("--D_sgd_momentum", type=float, default=0.0, dest="d_sgd_momentum")
    p.add_argument("--G_sgd_momentum", type=float, default=0.0, dest="g_sgd_momentum")
    p.add_argument("--batchSize", type=int, default=32, dest="batch_size")
    p.add_argument("--N_epoch", type=int, default=1000, dest="n_epoch")
    p.add_argument("--G_L1", type=float, default=0.0, dest="g_l1")
    p.add_argument("--G_L2", type=float, default=0.0, dest="g_l2")
    p.add_argument("--D_L1", type=float, default=1e-7, dest="d_l1")
    p.add_argument("--D_L2", type=float, default=0.0, dest="d_l2")
    p.add_argument("--D_iterations", type=int, default=1, dest="d_iterations")
    p.add_argument("--G_iterations", type=int, default=1, dest="g_iterations")
    p.add_argument("--D_clamp", type=float, default=1.0, dest="d_clamp")
    p.add_argument("--G_clamp", type=float, default=5.0, dest="g_clamp")
    p.add_argument("--D_optmethod", default="adam", dest="d_optmethod")
    p.add_argument("--G_optmethod", default="adam", dest="g_optmethod")
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--gpu", type=int, default=0, help="ignored; TPU backend")
    p.add_argument("--noiseDim", type=int, default=100, dest="noise_dim")
    p.add_argument("--window", type=int, default=3)
    p.add_argument("--coarseSize", type=int, default=16, dest="coarse_size")
    p.add_argument("--fineSize", type=int, default=32, dest="fine_size")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--aws", action="store_true")
    p.add_argument("--epochs", type=int, default=-1)
    p.add_argument("--syntheticData", action="store_true", dest="synthetic_data")
    p.add_argument("--datasetDir", default=None, dest="dataset_dir")
    p.add_argument("--meshShape", type=str, default="-1", dest="mesh_shape",
                   help="device mesh 'DP' or 'DP,MP' (data x model GSPMD), "
                        "-1 = all devices")
    p.add_argument("--boundaryPad", type=int, default=0, dest="boundary_pad",
                   help="widen the diff/coarse image interface inside the "
                        "train step (exact zero-weight reparameterization; "
                        "measured no-win on v5e, docs/KERNELS.md round 4; "
                        "0 = off)")
    a = p.parse_args(argv)
    cfg = C2FConfig(
        save=a.save, save_freq=a.save_freq, network=a.network, noplot=a.noplot,
        d_sgd_lr=a.d_sgd_lr, g_sgd_lr=a.g_sgd_lr,
        d_sgd_momentum=a.d_sgd_momentum, g_sgd_momentum=a.g_sgd_momentum,
        batch_size=a.batch_size, n_epoch=a.n_epoch,
        g_l1=a.g_l1, g_l2=a.g_l2, d_l1=a.d_l1, d_l2=a.d_l2,
        d_iterations=a.d_iterations, g_iterations=a.g_iterations,
        d_clamp=a.d_clamp, g_clamp=a.g_clamp,
        d_optmethod=a.d_optmethod, g_optmethod=a.g_optmethod,
        threads=a.threads, noise_dim=a.noise_dim, window=a.window,
        coarse_size=a.coarse_size, fine_size=a.fine_size,
        grayscale=a.grayscale, seed=a.seed, aws=a.aws,
        epochs=a.epochs, synthetic_data=a.synthetic_data,
        dataset_dir=a.dataset_dir,
        mesh_shape=tuple(int(x) for x in str(a.mesh_shape).split(",")),
        boundary_pad=a.boundary_pad,
    ).validate()
    from facegen.parallel import mesh2d_from_shape

    trainer = C2FTrainer(cfg, mesh=mesh2d_from_shape(cfg.mesh_shape))
    for _stats in trainer.run():
        pass


if __name__ == "__main__":
    main()
