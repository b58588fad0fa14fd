"""Sampler / eval CLI — the TPU rebuild of sample.lua.

Per run (sample.lua:79-112): generate 1024 images with G, save
`random1024_{run:04d}_base.png` (32 per row) and
`random256_{run:04d}_base.png` (16 per row, random subset); rank all
1024 with D and save `best_/worst_/random_{run:04d}_base.png` 8-per-row
64-image grids; with --neighbours, find the nearest training image (L2)
for each of the 16 best and save the paired grid
`best_{run:04d}_neighbours_base.png`.

The NN search is one MXU GEMM sweep over the HBM-resident dataset
(utils/infer.py:nearest_neighbours) instead of the reference's
O(16 x N) per-pair CPU loop (sample.lua:140-146, "takes long" per
README.md:59).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facegen.config import SampleConfig
from facegen.models import gan
from facegen.utils import checkpoint as ckpt
from facegen.utils.grids import save_grid, to_grid
from facegen.utils.infer import GanInference, nearest_neighbours


def load_models(cfg: SampleConfig):
    """Load G/D from a training checkpoint (sample.lua:247-274).

    The architecture comes from the checkpoint's own meta.json config —
    no shape flags needed, like torch.load carrying the whole net in the
    reference; explicit cfg values act as checked overrides
    (models/gan.py:restore_gan). Returns the RESOLVED SampleConfig as
    the last element so callers see the shapes actually loaded.
    """
    import dataclasses

    from facegen.train.loop import CKPT_NAME

    g, d, bundle, meta, res = gan.restore_gan(
        cfg.network or CKPT_NAME, default_dir=cfg.save, scale=cfg.scale,
        grayscale=cfg.grayscale, noise_dim=cfg.noise_dim, seed=cfg.seed,
    )
    if cfg.d_network:
        # --D_base: rank with a D trained elsewhere (sample.lua:255-257
        # loads a second .net when D_base ~= G_base). scale/grayscale are
        # passed as checked overrides so an incompatible D checkpoint
        # errors with both values spelled out; noise_dim is NOT checked —
        # D never consumes noise, so mixing runs with different noiseDim
        # is legitimate (as it is in the reference).
        d_loc = ckpt.split_network_arg(cfg.d_network, cfg.save)
        g_loc = ckpt.split_network_arg(cfg.network or CKPT_NAME, cfg.save)
        if d_loc != g_loc:
            _, d, d_bundle, _, _ = gan.restore_gan(
                cfg.d_network, default_dir=cfg.save, scale=res["scale"],
                grayscale=res["grayscale"], seed=cfg.seed,
            )
            bundle = dict(bundle, params_d=d_bundle["params_d"],
                          state_d=d_bundle["state_d"])
    cfg = dataclasses.replace(cfg, scale=res["scale"],
                              grayscale=res["grayscale"],
                              noise_dim=res["noise_dim"])
    return g, d, bundle, meta, cfg


def neighbours_grid(best: np.ndarray, matches: np.ndarray) -> np.ndarray:
    """Interleave generated/neighbour pairs like toNeighboursGrid
    (sample.lua:156-168): each column pair = (generated, its NN)."""
    n = best.shape[0]
    paired = np.empty((2 * n,) + best.shape[1:], best.dtype)
    paired[0::2] = best
    paired[1::2] = matches
    return to_grid(paired, nrow=8)


def run_sampling(cfg: SampleConfig, dataset=None, verbose: bool = True,
                 mesh=None):
    """dataset: optional (N, H, W, C) uint8 array for --neighbours.
    mesh: optional device mesh — generation, D-scoring and the NN GEMM
    run data-parallel over its "data" axis (utils/infer.py). When not
    given, cfg.mesh_shape is authoritative (empty = single-device)."""
    if mesh is None and cfg.mesh_shape:
        from facegen.parallel import mesh2d_from_shape

        mesh = mesh2d_from_shape(cfg.mesh_shape)
    g, d, bundle, meta, cfg = load_models(cfg)
    inf = GanInference(g, d, cfg.noise_dim, mesh=mesh)
    os.makedirs(cfg.writeto, exist_ok=True)
    nn_dataset = None  # uploaded/flattened once across runs
    c2f_models_loaded = None
    if cfg.c2f:
        # load the refinement nets once (sample.lua:70 loadModels of the
        # c2f pair; deprecated-but-present laplacian pyramid path)
        from types import SimpleNamespace

        from facegen.models import c2f as c2f_mod

        _, _, c2f_bundle, _, c2f_res = c2f_mod.restore_c2f(
            cfg.c2f_network, default_dir=cfg.save_c2f or cfg.save,
            seed=cfg.seed,
        )
        if cfg.d_c2f_network:
            # --D_c2f32: refine with a D from a different c2f checkpoint
            # (sample.lua:266-269). Geometry must agree with G's.
            c2f_dir = cfg.save_c2f or cfg.save
            d_loc = ckpt.split_network_arg(cfg.d_c2f_network, c2f_dir)
            g_loc = ckpt.split_network_arg(cfg.c2f_network, c2f_dir)
            if d_loc != g_loc:
                _, _, d_bundle, _, d_res = c2f_mod.restore_c2f(
                    cfg.d_c2f_network, default_dir=c2f_dir, seed=cfg.seed,
                )
                for k in ("fine_size", "channels"):
                    if d_res[k] != c2f_res[k]:
                        raise ValueError(
                            f"c2f D checkpoint {cfg.d_c2f_network!r} has "
                            f"{k}={d_res[k]} but the c2f G checkpoint "
                            f"{cfg.c2f_network!r} has {k}={c2f_res[k]}"
                        )
                c2f_bundle = dict(c2f_bundle,
                                  params_d=d_bundle["params_d"],
                                  state_d=d_bundle["state_d"])
        if c2f_res["channels"] != cfg.channels:
            raise ValueError(
                f"c2f checkpoint {cfg.c2f_network!r} has "
                f"{c2f_res['channels']} channels but the base checkpoint "
                f"has {cfg.channels}"
            )
        c2f_models_loaded = (SimpleNamespace(**c2f_res), c2f_bundle)
    outputs = []
    for run in range(1, cfg.runs + 1):
        key = jax.random.fold_in(jax.random.key(cfg.seed), run)
        k_gen, k_sub, k_rand = jax.random.split(key, 3)
        images = inf.generate_n(bundle, k_gen, 1024)
        imgs_np = np.asarray(images)

        sub = np.asarray(
            jax.random.permutation(k_sub, 1024)[:256]
        )
        p = lambda name: os.path.join(cfg.writeto, f"{name}_{run:04d}_base.png")
        outputs.append(save_grid(p("random1024"), imgs_np, nrow=32))
        outputs.append(save_grid(p("random256"), imgs_np[sub], nrow=16))

        best, best_scores = inf.rank(bundle, images, ascending=False, max_out=64)
        worst, _ = inf.rank(bundle, images, ascending=True, max_out=64)
        rand64 = imgs_np[np.asarray(jax.random.permutation(k_rand, 1024)[:64])]
        outputs.append(save_grid(p("best"), np.asarray(best), nrow=8))
        outputs.append(save_grid(p("worst"), np.asarray(worst), nrow=8))
        outputs.append(save_grid(p("random"), rand64, nrow=8))

        if c2f_models_loaded is not None:
            # refine best/worst/random through the c2f nets and save the
            # after grids next to the before grids (sample.lua:102-108:
            # best_%04d_c2f_32 / worst_%04d_c2f_32 / random_%04d_c2f_32)
            c2f_cfg, c2f_bundle = c2f_models_loaded
            fs = c2f_cfg.fine_size
            k_c2f = jax.random.fold_in(key, 777)
            for li, (label, imgs64) in enumerate((
                    ("best", np.asarray(best)),
                    ("worst", np.asarray(worst)),
                    ("random", rand64))):
                refined = refine_c2f(
                    c2f_cfg, c2f_bundle, jnp.asarray(imgs64),
                    jax.random.fold_in(k_c2f, li), tries=cfg.c2f_tries,
                )
                out_name = os.path.join(
                    cfg.writeto, f"{label}_{run:04d}_c2f_{fs}.png")
                outputs.append(save_grid(out_name, np.asarray(refined), nrow=8))

        if cfg.neighbours:
            if dataset is None:
                dataset = _load_dataset(cfg)
            if nn_dataset is None:
                from facegen.utils.infer import prepare_nn_dataset

                nn_dataset = prepare_nn_dataset(dataset, mesh=mesh)
            idx, dist = nearest_neighbours(jnp.asarray(best[:16]), nn_dataset)
            matches = np.asarray(dataset[idx[:, 0]], np.float32)
            if matches.dtype != np.float32 or matches.max() > 1.5:
                matches = matches.astype(np.float32) / 255.0
            from facegen.utils.grids import save_png

            grid = neighbours_grid(np.asarray(best[:16]), matches)
            out_path = os.path.join(cfg.writeto, f"best_{run:04d}_neighbours_base.png")
            outputs.append(save_png(out_path, grid))
        if verbose:
            print(f"run {run}/{cfg.runs} done "
                  f"(best score {float(best_scores[0]):.3f})")
    return outputs


def refine_c2f(
    c2f_cfg,
    bundle: dict,
    images: jax.Array,
    key: jax.Array,
    tries: int = 10,
):
    """Coarse-to-fine refinement of coarse images (sample.lua:176-214's
    deprecated c2f(): upscale to fineSize, generate `tries` candidate
    diffs per image, keep the one D scores highest, add it on).

    images: (N, coarse, coarse, C) floats in [0,1].
    Returns (N, fine, fine, C) refined images.
    """
    from facegen.models import c2f as c2f_models
    from facegen.nn.core import Ctx

    g = c2f_models.create_g(c2f_cfg.fine_size, c2f_cfg.channels)
    d = c2f_models.create_d(c2f_cfg.fine_size, c2f_cfg.channels)
    fs, c = c2f_cfg.fine_size, c2f_cfg.channels
    n = images.shape[0]

    @jax.jit
    def _refine(params_g, state_g, params_d, state_d, imgs, k):
        coarse = jax.image.resize(imgs.astype(jnp.float32), (n, fs, fs, c), "linear")
        z = jax.random.uniform(k, (n, tries, fs, fs, 1), jnp.float32, -1.0, 1.0)
        cond = jnp.broadcast_to(coarse[:, None], (n, tries, fs, fs, c))
        z_f = z.reshape(n * tries, fs, fs, 1)
        cond_f = cond.reshape(n * tries, fs, fs, c)
        diff, _ = g.apply(params_g, state_g, (z_f, cond_f), Ctx(None, False))
        logits, _ = d.apply(params_d, state_d, (diff, cond_f), Ctx(None, False))
        scores = logits.reshape(n, tries)
        best = jnp.argmax(scores, axis=1)  # max D score (sample.lua:198-206)
        diff_best = diff.reshape(n, tries, fs, fs, c)[jnp.arange(n), best]
        return jnp.clip(coarse + diff_best, 0.0, 1.0)

    return _refine(bundle["params_g"], bundle["state_g"],
                   bundle["params_d"], bundle["state_d"], images, key)


def _load_dataset(cfg: SampleConfig):
    """Training images at sampler scale for the NN search
    (sample.lua:135 loads the ENTIRE training set)."""
    from facegen.data.lfw import default_store_path, load_store
    from facegen.data.pipeline import prepare_pool

    path = default_store_path(cfg.aws, cfg.dataset_dir)
    if os.path.exists(path):
        store = load_store(path)
        pools = []
        for s in range(0, store.shape[0], 8192):
            raw = jax.device_put(np.ascontiguousarray(store[s : s + 8192]))
            pools.append(np.asarray(prepare_pool(
                raw, jax.random.key(0), cfg.scale, cfg.channels, augment=False
            )))
        return np.concatenate(pools)
    # synthetic fallback
    from facegen.data.synthetic import synthetic_faces

    raw = synthetic_faces(jax.random.key(0), 4096)
    return np.asarray(prepare_pool(raw, jax.random.key(0), cfg.scale,
                                   cfg.channels, augment=False))


def main(argv=None):
    p = argparse.ArgumentParser(description="facegen sampler (reference: th sample.lua)")
    p.add_argument("--save_base", type=str, default="logs", dest="save")
    p.add_argument("--G_base", type=str, default="adversarial", dest="network")
    p.add_argument("--D_base", type=str, default=None, dest="d_network",
                   help="rank with a D from a different checkpoint than G's "
                        "(sample.lua:255-257); default: G's own checkpoint")
    p.add_argument("--neighbours", action="store_true")
    # shape flags default to None = use the checkpoint's stored config
    # (sample.lua:247-274 needs none because torch.load carries the net);
    # passing one that contradicts the checkpoint errors clearly
    p.add_argument("--scale", type=int, default=None)
    p.add_argument("--grayscale", action="store_true", default=None)
    p.add_argument("--writeto", type=str, default="samples")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--gpu", type=int, default=0, help="ignored; TPU backend")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--noiseDim", type=int, default=None, dest="noise_dim")
    p.add_argument("--batchSize", type=int, default=16, dest="batch_size")
    p.add_argument("--aws", action="store_true")
    p.add_argument("--datasetDir", type=str, default=None, dest="dataset_dir",
                   help="packed store for --neighbours (default: "
                        "dataset/lfw64.npy; sample.lua:135 DATASET dirs)")
    p.add_argument("--c2f", action="store_true",
                   help="refine best/worst/random grids through a trained "
                        "coarse-to-fine GAN (sample.lua:102-110, :176-214)")
    p.add_argument("--G_c2f32", type=str, default="adversarial_c2f_16_to_32",
                   dest="c2f_network",
                   help="c2f checkpoint name or dir/name")
    p.add_argument("--D_c2f32", type=str, default=None, dest="d_c2f_network",
                   help="refine with a c2f D from a different checkpoint "
                        "(sample.lua:266-269); default: the --G_c2f32 one")
    p.add_argument("--save_c2f32", type=str, default="", dest="save_c2f",
                   help="c2f checkpoint dir (default: --save_base)")
    p.add_argument("--c2f_tries", type=int, default=10,
                   help="candidate diffs per image, best D score wins "
                        "(sample.lua:177)")
    p.add_argument("--meshShape", type=str, default="", dest="mesh_shape",
                   help="serving mesh 'DP' or 'DP,MP' (-1 = all devices); "
                        "default: single-device")
    a = p.parse_args(argv)
    cfg = SampleConfig(
        save=a.save, network=a.network, batch_size=a.batch_size,
        noise_dim=a.noise_dim, scale=a.scale, grayscale=a.grayscale,
        seed=a.seed, gpu=a.gpu, runs=a.runs, neighbours=a.neighbours,
        writeto=a.writeto, aws=a.aws, dataset_dir=a.dataset_dir,
        d_network=a.d_network,
        c2f=a.c2f, c2f_network=a.c2f_network,
        d_c2f_network=a.d_c2f_network,
        save_c2f=a.save_c2f, c2f_tries=a.c2f_tries,
        mesh_shape=tuple(int(x) for x in a.mesh_shape.split(",")) if a.mesh_shape
        else (),
    )
    run_sampling(cfg)
    print("Finished.")


if __name__ == "__main__":
    main()
