"""Autoencoder / denoiser trainers.

TPU rebuilds of the two auxiliary entry points:

- `train_autoencoder` — train_autoencoder.lua:148-239: flat grayscale AE
  on face crops, L1 loss (AbsCriterion :98), Adam, per-epoch shuffle,
  checkpoint every 50 epochs (:227-235), NaN guard (:241-247).
- `train_denoiser` — train_denoiser.lua:235-369: two-stage denoising AE;
  per batch, AE1 (noise encoder + conv decoder) trains on BCE vs the
  clean image, then AE2 (a second decoder) trains on AE1's OUTPUT, also
  vs the clean image (:298-336). Saves `denoiser_CxHxW` with the three
  sub-bundle keys (:352-363). Validation loss each epoch (:174-201).

Both epochs are single compiled lax.scans; the NaN abort (the
reference's exitIfNaNs) is a host-side check of the epoch-level loss.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facegen.config import TrainConfig
from facegen.models import ae as AE
from facegen.nn.core import Ctx
from facegen.utils import checkpoint as ckpt


def _sync(x) -> float:
    return float(jnp.sum(x))


def _shuffled_batches(key, n_pool, batch):
    n_batches = n_pool // batch
    perm = jax.random.permutation(key, n_pool)[: n_batches * batch]
    return perm.reshape(n_batches, batch)


def _weight_penalty(loss, grads, params, c1: float, c2: float):
    """L1/L2 penalty on the flat AE weight vector, biases included
    (train_autoencoder.lua:196-204; train_denoiser.lua:279-287):
    f += c1*||w||_1 + c2*||w||^2/2; grad += sign(w)*c1 + w*c2."""
    leaves = jax.tree.leaves(params)
    if c1:
        loss = loss + c1 * sum(jnp.sum(jnp.abs(l)) for l in leaves)
    if c2:
        loss = loss + 0.5 * c2 * sum(jnp.sum(jnp.square(l)) for l in leaves)
    grads = jax.tree.map(lambda g, p: g + jnp.sign(p) * c1 + p * c2,
                         grads, params)
    return loss, grads


def _clamp_grads(grads, c: float):
    """Total-gradient clamp to [-c, c] — applied AFTER the penalty adds
    in, like GRAD_PARAMETERS_AE:clamp (train_denoiser.lua:289-291)."""
    return jax.tree.map(lambda g: jnp.clip(g, -c, c), grads)


# ---------------------------------------------------------------------------
# flat autoencoder
# ---------------------------------------------------------------------------


def make_ae_epoch(model, cfg: TrainConfig, adam_lr: float = 1e-3, mesh=None):
    tx = optax.adam(adam_lr)

    def epoch(params, state, opt, rng, pool):
        n_pool = pool.shape[0]
        idx = _shuffled_batches(jax.random.fold_in(rng, 0), n_pool, cfg.batch_size)

        def body(carry, ib):
            params, state, opt = carry
            i, batch_idx = ib
            x = pool[batch_idx].astype(jnp.float32) / 255.0
            k = jax.random.fold_in(rng, 1 + i)

            def loss_fn(p):
                y, s = model.apply(p, state, x, Ctx(k, True))
                return jnp.mean(jnp.abs(y - x)), s  # AbsCriterion

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if cfg.coef_l1 or cfg.coef_l2:
                # the plain AE has the penalty but NO clamp
                # (train_autoencoder.lua:196-204 — no AE_clamp flag there)
                loss, grads = _weight_penalty(loss, grads, params,
                                              cfg.coef_l1, cfg.coef_l2)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt), loss

        (params, state, opt), losses = jax.lax.scan(
            body, (params, state, opt), (jnp.arange(idx.shape[0]), idx)
        )
        return params, state, opt, losses

    if mesh is not None:
        from facegen.parallel import gspmd_jit

        return gspmd_jit(epoch, mesh, n_state_args=3)
    return jax.jit(epoch)


def _dump_recon_grid(model_apply, pool, out_path: str, n: int = 16):
    """input|reconstruction pair grid — the PNG equivalent of the AE
    trainers' per-epoch sample plots (train_autoencoder.lua:250-272,
    train_denoiser.lua:174-201)."""
    import numpy as np

    from facegen.utils.grids import save_grid

    x = pool[:n].astype(jnp.float32) / 255.0
    y = model_apply(x)
    rows = np.empty((2 * n,) + x.shape[1:], np.float32)
    rows[0::2] = np.asarray(x)
    rows[1::2] = np.asarray(jnp.clip(y, 0, 1))
    save_grid(out_path, rows, nrow=8)


def train_autoencoder(cfg: TrainConfig, source=None, epochs: Optional[int] = None,
                      verbose: bool = True, mesh=None):
    """Returns (model, params, state, history). Grayscale by default —
    the reference AE is 1-channel only (train_autoencoder.lua:56-57).
    With `mesh` (axes "data" x "model"), the epoch runs GSPMD-sharded
    (parallel/gspmd.py recipe) with identical global-batch semantics."""
    from facegen.data.pipeline import make_source

    # the reference AE bottleneck default is 256 (train_autoencoder.lua:22);
    # the CLI injects it — an explicit --noiseDim is honored as given
    model = AE.create_autoencoder(cfg.scale, cfg.channels, cfg.noise_dim)
    params, state, _ = model.init(jax.random.key(cfg.seed),
                                  (cfg.scale, cfg.scale, cfg.channels))
    from facegen.nn import init as winit

    params = winit.gaussian_overwrite(params, jax.random.key(cfg.seed + 1))
    tx_opt = optax.adam(1e-3).init(params)
    if mesh is not None:
        from facegen.parallel import ensure_mesh2d
        from facegen.parallel.multihost import warmup_collectives

        mesh = ensure_mesh2d(mesh)
        warmup_collectives(mesh)  # no-op single-process
    epoch_fn = make_ae_epoch(model, cfg, mesh=mesh)
    source = source or make_source(cfg)
    n_pool = min(cfg.n_epoch if cfg.n_epoch > 0 else 10000, 16384)
    if mesh is not None:
        # round down to a data-axis multiple: the shuffled-permutation
        # sampler must never see wrap-padded duplicate rows
        n_pool -= n_pool % mesh.shape["data"]
    if n_pool < cfg.batch_size:
        # a sub-batch pool would yield ZERO batches per epoch and train
        # nothing while reporting loss 0.0 — fail loudly instead
        raise ValueError(
            f"epoch pool of {n_pool} images is smaller than "
            f"batchSize {cfg.batch_size}; raise --N_epoch or lower "
            f"--batchSize"
        )
    pool = source.epoch_pool(jax.random.key(cfg.seed + 2), n_pool)
    if mesh is not None:
        from facegen.parallel import shard_pool_2d

        pool = shard_pool_2d(pool, mesh)
    history = []
    n = epochs if epochs is not None else (cfg.epochs if cfg.epochs > 0 else 1)
    for e in range(n):
        t0 = time.perf_counter()
        params, state, tx_opt, losses = epoch_fn(
            params, state, tx_opt, jax.random.fold_in(jax.random.key(cfg.seed), e), pool
        )
        mean_loss = _sync(losses) / max(losses.shape[0], 1)
        dt = time.perf_counter() - t0
        if mean_loss != mean_loss:  # NaN guard (train_autoencoder.lua:241-247)
            raise FloatingPointError(f"NaN loss at epoch {e}")
        history.append({"epoch": e + 1, "loss": mean_loss, "seconds": dt})
        if verbose:
            print(f"<AE> epoch {e+1}: L1 loss {mean_loss:.5f} ({dt:.2f}s)")
        if (e + 1) % 50 == 0 or e + 1 == n:
            # save-every-50 (train_autoencoder.lua:227-235) plus the
            # repo rule: a bounded run must not exit unsaved
            ckpt.save(cfg.save, AE.AE_CKPT_NAME,
                      {"params": params, "state": state, "opt": tx_opt},
                      meta={"epoch": e + 1, **ckpt.config_meta(cfg)})
    if not cfg.noplot:
        _dump_recon_grid(
            lambda x: model.apply(params, state, x, Ctx(None, False))[0],
            pool, os.path.join(cfg.save, "viz", "ae_recon.png"),
        )
    return model, params, state, history


# ---------------------------------------------------------------------------
# two-stage denoiser
# ---------------------------------------------------------------------------


def _bce(y, t):
    eps = 1e-7
    y = jnp.clip(y.astype(jnp.float32), eps, 1 - eps)
    t = t.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(y) + (1 - t) * jnp.log1p(-y))


def make_denoiser_epoch(enc, dec1, dec2, cfg: TrainConfig, mesh=None):
    tx = optax.adam(1e-3)

    def epoch(bundle, opt1, opt2, rng, pool):
        idx = _shuffled_batches(jax.random.fold_in(rng, 0), pool.shape[0],
                                cfg.batch_size)

        def body(carry, ib):
            bundle, opt1, opt2 = carry
            i, batch_idx = ib
            x = pool[batch_idx].astype(jnp.float32) / 255.0
            k = jax.random.fold_in(rng, 1 + i)
            k_enc, k_d1, k_enc2, k_d1b, k_d2 = jax.random.split(k, 5)

            # AE1: encoder (white noise) + decoder1, BCE vs clean x
            def loss1(p1):
                noisy, s_enc = enc.apply(bundle["AE1_ENCODER"]["params"],
                                         bundle["AE1_ENCODER"]["state"],
                                         x, Ctx(k_enc, True))
                y, s1 = dec1.apply(p1, bundle["AE1_DECODER"]["state"], noisy,
                                   Ctx(k_d1, True))
                return _bce(y, x), s1

            (l1, s1), g1 = jax.value_and_grad(loss1, has_aux=True)(
                bundle["AE1_DECODER"]["params"]
            )
            if cfg.coef_l1 or cfg.coef_l2:
                # the penalty feeds only the GRADIENT; the reported
                # per-epoch loss stays the bare BCE — the reference
                # accumulates CRITERION.output before the penalty is
                # added (train_denoiser.lua:272,311)
                _, g1 = _weight_penalty(l1, g1, bundle["AE1_DECODER"]["params"],
                                        cfg.coef_l1, cfg.coef_l2)
            if cfg.ae_clamp:
                g1 = _clamp_grads(g1, cfg.ae_clamp)
            up1, opt1 = tx.update(g1, opt1, bundle["AE1_DECODER"]["params"])
            p1 = optax.apply_updates(bundle["AE1_DECODER"]["params"], up1)

            # AE2: second decoder consumes AE1's output — the reference
            # re-runs AE1's train-mode forward AFTER its Adam step
            # (optim.adam(fevalAE,...) precedes fevalAE2's AE:forward,
            # train_denoiser.lua:335-336 + :313-315), with a fresh
            # WhiteNoise draw; BN running stats advance again too.
            noisy2, _ = enc.apply(bundle["AE1_ENCODER"]["params"],
                                  bundle["AE1_ENCODER"]["state"],
                                  x, Ctx(k_enc2, True))
            y1, s1 = dec1.apply(p1, s1, noisy2, Ctx(k_d1b, True))
            y1 = jax.lax.stop_gradient(y1)

            def loss2(p2):
                y, s2 = dec2.apply(p2, bundle["AE2_DECODER"]["state"], y1,
                                   Ctx(k_d2, True))
                return _bce(y, x), s2

            (l2, s2), g2 = jax.value_and_grad(loss2, has_aux=True)(
                bundle["AE2_DECODER"]["params"]
            )
            if cfg.coef_l1 or cfg.coef_l2:
                _, g2 = _weight_penalty(l2, g2, bundle["AE2_DECODER"]["params"],
                                        cfg.coef_l1, cfg.coef_l2)
            if cfg.ae_clamp:
                g2 = _clamp_grads(g2, cfg.ae_clamp)
            up2, opt2 = tx.update(g2, opt2, bundle["AE2_DECODER"]["params"])
            p2 = optax.apply_updates(bundle["AE2_DECODER"]["params"], up2)

            bundle = {
                "AE1_ENCODER": bundle["AE1_ENCODER"],
                "AE1_DECODER": {"params": p1, "state": s1},
                "AE2_DECODER": {"params": p2, "state": s2},
            }
            return (bundle, opt1, opt2), jnp.stack([l1, l2])

        (bundle, opt1, opt2), losses = jax.lax.scan(
            body, (bundle, opt1, opt2), (jnp.arange(idx.shape[0]), idx)
        )
        return bundle, opt1, opt2, losses

    if mesh is not None:
        from facegen.parallel import gspmd_jit

        return gspmd_jit(epoch, mesh, n_state_args=3)
    return jax.jit(epoch)


def make_denoiser_val(dec1, cfg: TrainConfig):
    @jax.jit
    def val_loss(bundle, pool):
        x = pool.astype(jnp.float32) / 255.0
        y, _ = dec1.apply(bundle["AE1_DECODER"]["params"],
                          bundle["AE1_DECODER"]["state"], x, Ctx(None, False))
        return _bce(y, x)

    return val_loss


def train_denoiser(cfg: TrainConfig, source=None, epochs: Optional[int] = None,
                   verbose: bool = True, mesh=None):
    """Returns (modules, bundle, history). Default scale for the
    reference denoiser is 16 (train_denoiser.lua:34). With `mesh`, the
    epoch runs GSPMD-sharded (see train_autoencoder)."""
    from facegen.data.pipeline import make_source

    enc, dec1, dec2, bundle = AE.init_denoiser(jax.random.key(cfg.seed),
                                               cfg.scale, cfg.channels)
    start_epoch = 0
    if cfg.network:
        # --network resume (train_denoiser.lua:67-77: restores the three
        # sub-modules and EPOCH; optimizer state starts fresh, like the
        # reference's OPTSTATE = {} after the load). The reference
        # ignores the flag's VALUE and hardcodes 'denoiser.net' in
        # --save; here the value is honored as a name or dir/name, and
        # a bare sentinel like "1" falls back to the standard name.
        name = cfg.network
        if not ckpt.exists(*ckpt.split_network_arg(name, cfg.save)):
            name = AE.denoiser_ckpt_name(cfg.scale, cfg.channels)
        directory, name = ckpt.split_network_arg(name, cfg.save)
        bundle, meta = ckpt.load(directory, name, bundle)
        start_epoch = int(meta.get("epoch", 0))
        if verbose:
            print(f"<trainer> reloaded denoiser from "
                  f"{os.path.join(directory, name)} (epoch {start_epoch})")
    tx = optax.adam(1e-3)
    opt1 = tx.init(bundle["AE1_DECODER"]["params"])
    opt2 = tx.init(bundle["AE2_DECODER"]["params"])
    if mesh is not None:
        from facegen.parallel import ensure_mesh2d
        from facegen.parallel.multihost import warmup_collectives

        mesh = ensure_mesh2d(mesh)
        warmup_collectives(mesh)  # no-op single-process
    epoch_fn = make_denoiser_epoch(enc, dec1, dec2, cfg, mesh=mesh)
    val_fn = make_denoiser_val(dec1, cfg)
    # TRAIN = images [1, 10000], VAL = [10001, 10256]
    # (train_denoiser.lua:153-156): validation must be DISJOINT from
    # training draws — reserve the first 256 rows and slice them
    # un-augmented, like the c2f trainer's holdout.
    if source is None:
        source = make_source(cfg, holdout=256)
    n_pool = min(cfg.n_epoch if cfg.n_epoch > 0 else 10000, 16384)
    if mesh is not None:
        n_pool -= n_pool % mesh.shape["data"]  # see train_autoencoder
    if n_pool < cfg.batch_size:
        raise ValueError(  # see train_autoencoder: zero batches otherwise
            f"epoch pool of {n_pool} images is smaller than "
            f"batchSize {cfg.batch_size}; raise --N_epoch or lower "
            f"--batchSize"
        )
    pool = source.epoch_pool(jax.random.key(cfg.seed + 2), n_pool)
    val_pool = source.range_pool(0, 256, jax.random.key(cfg.seed + 3))
    if mesh is not None:
        from facegen.parallel import shard_pool_2d

        pool = shard_pool_2d(pool, mesh)
    history = []
    n = epochs if epochs is not None else (cfg.epochs if cfg.epochs > 0 else 1)
    for e in range(start_epoch, start_epoch + n):
        t0 = time.perf_counter()
        bundle, opt1, opt2, losses = epoch_fn(
            bundle, opt1, opt2, jax.random.fold_in(jax.random.key(cfg.seed), e), pool
        )
        # one device->host fetch per epoch (scalar pulls are a remote
        # round-trip each on tunnel-attached chips)
        mean, vloss = jax.device_get(
            (jnp.mean(losses, axis=0), val_fn(bundle, val_pool)))
        mean, vloss = np.asarray(mean), float(vloss)
        dt = time.perf_counter() - t0
        if not np.isfinite(mean).all():  # exitIfNaNs (train_denoiser.lua:371-379)
            raise FloatingPointError(f"NaN loss at epoch {e}")
        history.append({"epoch": e + 1, "loss_ae1": float(mean[0]),
                        "loss_ae2": float(mean[1]), "val_loss": vloss,
                        "seconds": dt})
        if verbose:
            print(f"<denoiser> epoch {e+1}: AE1 {mean[0]:.5f} AE2 {mean[1]:.5f} "
                  f"val {vloss:.5f} ({dt:.2f}s)")
        if (e + 1) % 50 == 0 or e + 1 == start_epoch + n:
            ckpt.save(cfg.save, AE.denoiser_ckpt_name(cfg.scale, cfg.channels),
                      bundle, meta={"epoch": e + 1, **ckpt.config_meta(cfg)})
    if not cfg.noplot:
        _dump_recon_grid(
            lambda x: dec1.apply(bundle["AE1_DECODER"]["params"],
                                 bundle["AE1_DECODER"]["state"], x,
                                 Ctx(None, False))[0],
            val_pool, os.path.join(cfg.save, "viz", "denoiser_recon.png"),
        )
    return (enc, dec1, dec2), bundle, history
