"""Configuration dataclasses + CLI.

Replaces the reference's `pl.lapp` flag blocks and the global ``OPT``
table (train.lua:16-50, SURVEY.md section 5 "Config / flag system") with
explicit, typed config objects. Every public reference flag is
reproduced; TPU-specific knobs (mesh shape, compute dtype, per-chip
batch) are additive.
"""

from __future__ import annotations

import argparse
import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Flags of `th train.lua` (train.lua:16-50) + TPU additions."""

    # --- reference flags (names kept 1:1 where sensible) ------------------
    batch_size: int = 32          # --batchSize (even, >= 4; train.lua:56-60)
    save: str = "logs"            # --save
    save_freq: int = 30           # --saveFreq
    network: str = ""             # --network (checkpoint to resume)
    noplot: bool = False          # --noplot
    n_epoch: int = 1000           # --N_epoch (examples per epoch, -1 = all)
    g_sgd_lr: float = 0.02        # --G_SGD_lr
    g_sgd_momentum: float = 0.0   # --G_SGD_momentum
    d_sgd_lr: float = 0.02        # --D_SGD_lr
    d_sgd_momentum: float = 0.0   # --D_SGD_momentum
    g_adam_lr: float = -1.0       # --G_adam_lr (-1 = optim default 0.001)
    d_adam_lr: float = -1.0       # --D_adam_lr
    g_l1: float = 0.0             # --G_L1
    g_l2: float = 0.0             # --G_L2
    d_l1: float = 0.0             # --D_L1
    d_l2: float = 1e-4            # --D_L2
    d_iterations: int = 1         # --D_iterations
    g_iterations: int = 1         # --G_iterations
    d_max_acc: float = 1.01       # --D_maxAcc (accuracy gate threshold)
    d_clamp: float = 1.0          # --D_clamp (0 = off)
    g_clamp: float = 5.0          # --G_clamp (0 = off)
    d_optmethod: str = "adam"     # --D_optmethod: sgd|adagrad|adam
    g_optmethod: str = "adam"     # --G_optmethod
    threads: int = 8              # --threads (host-side decode workers here)
    noise_dim: int = 100          # --noiseDim
    window: int = 3               # --window: viz window id base (train.lua:44);
    #                               non-default ids prefix viz PNGs with w{id}_
    scale: int = 32               # --scale (16 or 32)
    seed: int = 1                 # --seed
    weights_vis_freq: int = 0     # --weightsVisFreq
    grayscale: bool = False       # --grayscale
    denoise: bool = False         # --denoise
    aws: bool = False             # --aws (dataset dir switch, train.lua:166)
    # AE/denoiser-only flags (train_autoencoder.lua:23-24,
    # train_denoiser.lua:28-30): L1/L2 penalty on the flat AE weight
    # vector, and the denoiser's total-gradient clamp (ON by default
    # there — AE_clamp default 1, train_denoiser.lua:30; the plain AE
    # trainer has no clamp). Ignored by the GAN trainer.
    coef_l1: float = 0.0          # --coefL1
    coef_l2: float = 0.0          # --coefL2
    ae_clamp: float = 1.0         # --AE_clamp (0 = off)

    # --- TPU-native additions ---------------------------------------------
    mesh_shape: Tuple[int, ...] = (-1,)   # -1 = all local devices, axis "data"
    compute_dtype: str = "bfloat16"       # activations dtype; params stay fp32
    reference_init: bool = True           # reproduce train.lua gaussian overwrite
    reference_g_penalty_bug: bool = True  # reproduce adversarial.lua:223 (G_L2
                                          # used for both L1 and L2 grad terms)
    dataset_dir: Optional[str] = None     # override; default mirrors train.lua:166-173
    synthetic_data: bool = False          # procedural faces when no LFW on disk
    epochs: int = -1                      # stop after N epochs (-1 = run forever,
                                          # like the reference's `while true`)
    guard_nonfinite: bool = False         # skip any update whose gradients are
                                          # non-finite (optax.apply_if_finite-
                                          # style; off by default for parity)
    epochs_per_compile: int = 0           # compile N epochs into one program
                                          # (train/step.py:make_multi_epoch_fn);
                                          # 0 = auto (8 when --noplot and no
                                          # weightsVisFreq, else 1 so per-epoch
                                          # viz cadence is preserved)
    trace_dir: Optional[str] = None       # jax.profiler trace of epoch 1
    debug_nans: bool = False              # jax_debug_nans mode
    noise_view: str = "nhwc"              # how G's fc output becomes planes:
                                          # "nhwc" reshape (s0,s0,128) (native
                                          # layout) vs "nchw" = reference
                                          # nn.View(128,s0,s0) (models.lua:60)
                                          # followed by a transpose — same
                                          # architecture, different fc-unit ->
                                          # (plane, pixel) wiring. Ablation
                                          # knob for the matched-budget
                                          # convergence study (ROUND5).
    g_train_in_d_phase: bool = True       # G forward runs in train mode while
                                          # making D's fakes (BN running stats
                                          # update; adversarial.lua:252
                                          # createImages under net:training()).
                                          # False = eval-mode fakes (ablation).
    boundary_pad: int = 0                 # widen the G->D image interface to
                                          # this many channels inside the
                                          # train step (exact zero-weight
                                          # reparameterization of the C=3/C=1
                                          # boundary convs). Measured EQUAL-
                                          # OR-SLOWER at every width on v5e —
                                          # default off; kept as the
                                          # documented experiment (docs/
                                          # KERNELS.md round 4)

    # ------------------------------------------------------------------
    @property
    def channels(self) -> int:
        return 1 if self.grayscale else 3

    @property
    def img_shape(self) -> Tuple[int, int, int]:
        """Per-example NHWC shape (reference IMG_DIMENSIONS is CHW)."""
        return (self.scale, self.scale, self.channels)

    @property
    def input_sz(self) -> int:
        return self.scale * self.scale * self.channels

    @property
    def accs_interval(self) -> int:
        """Rolling window for the D accuracy gate.

        train.lua:207: max(20, min(1000/batchSize, 250)); the Lua table
        holds floor(value) entries once the `#accs > interval` trim in
        adversarial.lua:157-159 kicks in.
        """
        return int(math.floor(max(20.0, min(1000.0 / self.batch_size, 250.0))))

    @property
    def d_adam_lr_effective(self) -> float:
        return self.d_adam_lr if self.d_adam_lr > 0 else 1e-3

    @property
    def g_adam_lr_effective(self) -> float:
        return self.g_adam_lr if self.g_adam_lr > 0 else 1e-3

    def validate(self) -> "TrainConfig":
        if self.batch_size % 2 != 0 or self.batch_size < 4:
            raise ValueError(
                "batch size must be a multiple of 2 and >= 4 (train.lua:56-60)"
            )
        if self.scale not in (16, 32):
            # reference only warns (train.lua:52-54)
            import warnings

            warnings.warn("[Warning] models are not optimized for chosen scale")
        if self.d_optmethod not in ("sgd", "adagrad", "adam"):
            raise ValueError(f"unknown D optimizer {self.d_optmethod!r}")
        if self.g_optmethod not in ("sgd", "adagrad", "adam"):
            raise ValueError(f"unknown G optimizer {self.g_optmethod!r}")
        return self


@dataclasses.dataclass(frozen=True)
class C2FConfig:
    """Flags of `th train_c2f.lua` (train_c2f.lua:16-46). Defaults differ
    from the base GAN: D_L1 1e-7, D_L2 0 (:29-30); adagrad lrs D 1e-3 /
    G 3e-3 (:163-166)."""

    save: str = "logs"
    save_freq: int = 30
    network: str = ""
    noplot: bool = False
    d_sgd_lr: float = 0.02
    g_sgd_lr: float = 0.02
    d_sgd_momentum: float = 0.0
    g_sgd_momentum: float = 0.0
    batch_size: int = 32
    n_epoch: int = 1000
    g_l1: float = 0.0
    g_l2: float = 0.0
    d_l1: float = 1e-7
    d_l2: float = 0.0
    d_iterations: int = 1
    g_iterations: int = 1
    d_clamp: float = 1.0
    g_clamp: float = 5.0
    d_optmethod: str = "adam"
    g_optmethod: str = "adam"
    threads: int = 4
    noise_dim: int = 100   # kept for CLI parity; c2f noise is image-shaped
    window: int = 3
    coarse_size: int = 16
    fine_size: int = 32
    grayscale: bool = False
    seed: int = 1
    aws: bool = False
    # TPU additions
    compute_dtype: str = "bfloat16"
    reference_g_penalty_bug: bool = True
    dataset_dir: Optional[str] = None
    synthetic_data: bool = False
    epochs: int = -1
    val_size: int = 500    # VAL_DATA = loadImages(0, 500) (train_c2f.lua:218)
    parzen_samples: int = 200
    mesh_shape: Tuple[int, ...] = (-1,)  # 'DP[,MP]' GSPMD mesh (parallel/gspmd.py)
    boundary_pad: int = 0  # widen the diff/coarse image interface inside the
                           # train step (exact zero-weight reparameterization
                           # of G_d's 7x7 256->C output conv + D_c's first
                           # conv; docs/KERNELS.md round 4). 0 = off

    @property
    def channels(self) -> int:
        return 1 if self.grayscale else 3

    @property
    def img_shape(self) -> Tuple[int, int, int]:
        return (self.fine_size, self.fine_size, self.channels)

    def validate(self) -> "C2FConfig":
        if self.batch_size % 2 != 0 or self.batch_size < 4:
            raise ValueError("batch size must be even and >= 4")
        return self


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Flags of `th sample.lua` (sample.lua:9-24).

    scale/grayscale/noise_dim default to None = "use the checkpoint's
    stored config" (models/gan.py:restore_gan — the analogue of
    torch.load carrying the whole net, sample.lua:247-274). Explicit
    values are checked overrides: a contradiction with the checkpoint
    errors clearly.
    """

    save: str = "logs"            # --save (checkpoint dir)
    network: str = "adversarial"  # checkpoint name (reference: adversarial.net)
    # --D_base: rank with a D from a DIFFERENT checkpoint than G's
    # (sample.lua:13, :255-257 loads D separately when D_base ~= G_base).
    # None = G's own checkpoint. Shape compatibility is checked at load.
    d_network: Optional[str] = None
    batch_size: int = 32
    noise_dim: Optional[int] = None
    scale: Optional[int] = None
    grayscale: Optional[bool] = None
    seed: int = 1
    gpu: int = 0                  # kept for CLI parity; ignored (TPU)
    runs: int = 1                 # --runs
    neighbours: bool = False      # --neighbours
    writeto: str = "samples"      # --writeto
    aws: bool = False
    dataset_dir: Optional[str] = None  # --datasetDir: store for --neighbours
                                       # (sample.lua:135 DATASET dirs)
    # c2f refinement of the best/worst/random grids (the deprecated
    # laplacian-pyramid path, sample.lua:102-110 + c2f() :176-214)
    c2f: bool = False
    c2f_network: str = "adversarial_c2f_16_to_32"  # --G_c2f32 default
    # --D_c2f32: c2f D from a different checkpoint (sample.lua:266-269)
    d_c2f_network: Optional[str] = None
    save_c2f: str = ""            # --save_c2f32 (empty = same as save)
    c2f_tries: int = 10           # triesPerImage (sample.lua:177)
    # TPU addition: 'DP[,MP]' data-parallel serving mesh (parallel/gspmd.py);
    # empty = single-device serving (the default — unlike training, where
    # using every chip is the right default, a sampler request is small)
    mesh_shape: Tuple[int, ...] = ()

    @property
    def channels(self) -> int:
        return 1 if self.grayscale else 3


def _add_bool(p: argparse.ArgumentParser, name: str, default: bool, help: str):
    p.add_argument(name, action="store_true", default=default, help=help)


def train_arg_parser() -> argparse.ArgumentParser:
    """CLI mirroring train.lua's lapp block flag-for-flag."""
    p = argparse.ArgumentParser(
        description="facegen TPU GAN trainer (reference: th train.lua)"
    )
    p.add_argument("--batchSize", type=int, default=32, dest="batch_size")
    p.add_argument("--save", type=str, default="logs")
    p.add_argument("--saveFreq", type=int, default=30, dest="save_freq")
    p.add_argument("--network", type=str, default="")
    _add_bool(p, "--noplot", False, "do not dump visualization grids")
    p.add_argument("--N_epoch", type=int, default=1000, dest="n_epoch")
    p.add_argument("--G_SGD_lr", type=float, default=0.02, dest="g_sgd_lr")
    p.add_argument("--G_SGD_momentum", type=float, default=0.0, dest="g_sgd_momentum")
    p.add_argument("--D_SGD_lr", type=float, default=0.02, dest="d_sgd_lr")
    p.add_argument("--D_SGD_momentum", type=float, default=0.0, dest="d_sgd_momentum")
    p.add_argument("--G_adam_lr", type=float, default=-1.0, dest="g_adam_lr")
    p.add_argument("--D_adam_lr", type=float, default=-1.0, dest="d_adam_lr")
    p.add_argument("--G_L1", type=float, default=0.0, dest="g_l1")
    p.add_argument("--G_L2", type=float, default=0.0, dest="g_l2")
    p.add_argument("--D_L1", type=float, default=0.0, dest="d_l1")
    p.add_argument("--D_L2", type=float, default=1e-4, dest="d_l2")
    p.add_argument("--D_iterations", type=int, default=1, dest="d_iterations")
    p.add_argument("--G_iterations", type=int, default=1, dest="g_iterations")
    p.add_argument("--D_maxAcc", type=float, default=1.01, dest="d_max_acc")
    p.add_argument("--D_clamp", type=float, default=1.0, dest="d_clamp")
    p.add_argument("--G_clamp", type=float, default=5.0, dest="g_clamp")
    p.add_argument("--D_optmethod", type=str, default="adam", dest="d_optmethod")
    p.add_argument("--G_optmethod", type=str, default="adam", dest="g_optmethod")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--gpu", type=int, default=0, help="ignored; TPU backend")
    p.add_argument("--noiseDim", type=int, default=100, dest="noise_dim")
    p.add_argument("--window", type=int, default=3)
    p.add_argument("--scale", type=int, default=32)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--weightsVisFreq", type=int, default=0, dest="weights_vis_freq")
    _add_bool(p, "--grayscale", False, "train on 1-channel images")
    _add_bool(p, "--denoise", False, "apply trained denoiser to samples")
    _add_bool(p, "--aws", False, "AWS dataset path (train.lua:166-170)")
    # AE/denoiser flags (train_autoencoder.lua:23-24, train_denoiser.lua:28-30)
    p.add_argument("--coefL1", type=float, default=0.0, dest="coef_l1",
                   help="AE weight L1 penalty (AE/denoiser trainers only)")
    p.add_argument("--coefL2", type=float, default=0.0, dest="coef_l2",
                   help="AE weight L2 penalty (AE/denoiser trainers only)")
    p.add_argument("--AE_clamp", type=float, default=1.0, dest="ae_clamp",
                   help="denoiser gradient clamp, 0 = off "
                        "(train_denoiser.lua:289-291; default ON at 1)")
    # TPU additions
    p.add_argument("--computeDtype", type=str, default="bfloat16",
                   dest="compute_dtype", choices=["bfloat16", "float32"])
    p.add_argument("--meshShape", type=str, default="-1", dest="mesh_shape",
                   help="device mesh: 'N' = N-way data-parallel shard_map "
                        "(-1 = all devices); 'DP,MP' = 2-D data x model "
                        "GSPMD mesh (parallel/gspmd.py)")
    p.add_argument("--epochs", type=int, default=-1,
                   help="number of epochs to run (-1 = forever)")
    p.add_argument("--epochsPerCompile", type=int, default=0,
                   dest="epochs_per_compile",
                   help="compile N epochs into one device program (amortizes "
                        "host sync; 0 = auto: 8 under --noplot, else 1)")
    p.add_argument("--boundaryPad", type=int, default=0, dest="boundary_pad",
                   help="widen the G->D image interface to this many "
                        "channels inside the train step (exact zero-weight "
                        "reparameterization; measured no-win on v5e, see "
                        "docs/KERNELS.md round 4; 0 = off)")
    _add_bool(p, "--modernInit", False, "disable reference gaussian-overwrite init")
    _add_bool(p, "--syntheticData", False, "use procedural data (no LFW needed)")
    p.add_argument("--datasetDir", type=str, default=None, dest="dataset_dir")
    return p


def train_config_from_args(argv=None) -> TrainConfig:
    args = train_arg_parser().parse_args(argv)
    mesh = tuple(int(x) for x in str(args.mesh_shape).split(","))
    cfg = TrainConfig(
        batch_size=args.batch_size,
        save=args.save,
        save_freq=args.save_freq,
        network=args.network,
        noplot=args.noplot,
        n_epoch=args.n_epoch,
        g_sgd_lr=args.g_sgd_lr,
        g_sgd_momentum=args.g_sgd_momentum,
        d_sgd_lr=args.d_sgd_lr,
        d_sgd_momentum=args.d_sgd_momentum,
        g_adam_lr=args.g_adam_lr,
        d_adam_lr=args.d_adam_lr,
        g_l1=args.g_l1,
        g_l2=args.g_l2,
        d_l1=args.d_l1,
        d_l2=args.d_l2,
        d_iterations=args.d_iterations,
        g_iterations=args.g_iterations,
        d_max_acc=args.d_max_acc,
        d_clamp=args.d_clamp,
        g_clamp=args.g_clamp,
        d_optmethod=args.d_optmethod,
        g_optmethod=args.g_optmethod,
        threads=args.threads,
        noise_dim=args.noise_dim,
        window=args.window,
        scale=args.scale,
        seed=args.seed,
        weights_vis_freq=args.weights_vis_freq,
        grayscale=args.grayscale,
        denoise=args.denoise,
        aws=args.aws,
        coef_l1=args.coef_l1,
        coef_l2=args.coef_l2,
        ae_clamp=args.ae_clamp,
        mesh_shape=mesh,
        compute_dtype=args.compute_dtype,
        reference_init=not args.modernInit,
        dataset_dir=args.dataset_dir,
        synthetic_data=args.syntheticData,
        epochs=args.epochs,
        epochs_per_compile=args.epochs_per_compile,
        boundary_pad=args.boundary_pad,
    )
    return cfg.validate()
