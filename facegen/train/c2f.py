"""Coarse-to-fine refinement GAN training engine + loop.

Rebuild of adversarial_c2f.lua and the train_c2f.lua driver. Differences
from the base engine (train/step.py), mirroring the reference:

- D consumes (diff, coarse) pairs; its first op sums them back into a
  reconstructed fine image (models/c2f.py add_pair).
- G consumes (image-shaped noise, coarse) and emits a signed diff.
- The D-batch's fake half uses FRESH random coarse conditions, not the
  real half's (adversarial_c2f.lua:136-142).
- STOCK optimizers, no accuracy gate (adversarial_c2f.lua:154-163).
- approxParzen eval (adversarial_c2f.lua:305-344): for each of nsamples
  validation images, generate nneighbors refinements of its coarse and
  take the min L2 distance to the true fine; mean drives the `.bestnet`
  checkpoint. Here it is one batched jit (G over nsamples*nneighbors at
  once) instead of a 200-iteration Lua loop.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facegen.config import C2FConfig
from facegen.data.c2f import C2FPool, gather_triple, make_triples
from facegen.models import c2f as c2f_models
from facegen.nn.core import Ctx, Module
from facegen.train import losses, metrics as M
# same batch-advance semantics as the base engine (adversarial_c2f.lua
# steps like adversarial.lua:54); one implementation, imported
from facegen.train.step import make_boundary_padder, steps_per_epoch  # noqa: F401
from facegen.utils import checkpoint as ckpt


class C2FState(NamedTuple):
    params_g: Any
    state_g: Any
    params_d: Any
    state_d: Any
    opt_g: Any
    opt_d: Any
    confusion: jax.Array
    epoch: jax.Array


class C2FStepMetrics(NamedTuple):
    loss_d: jax.Array
    loss_g: jax.Array
    acc_d: jax.Array


def _make_tx(method: str, cfg: C2FConfig, which: str):
    if method == "adam":
        return optax.adam(1e-3)
    if method == "adagrad":
        # train_c2f.lua:163-166: adagrad lr D 1e-3, G 3e-3
        lr = 1e-3 if which == "D" else 3e-3
        return optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    if method == "sgd":
        lr = cfg.d_sgd_lr if which == "D" else cfg.g_sgd_lr
        mom = cfg.d_sgd_momentum if which == "D" else cfg.g_sgd_momentum
        return optax.sgd(lr, momentum=mom if mom > 0 else None)
    raise ValueError(method)


def init_c2f_state(cfg: C2FConfig, bundle: dict) -> C2FState:
    tx_d = _make_tx(cfg.d_optmethod, cfg, "D")
    tx_g = _make_tx(cfg.g_optmethod, cfg, "G")
    return C2FState(
        params_g=bundle["params_g"],
        state_g=bundle["state_g"],
        params_d=bundle["params_d"],
        state_d=bundle["state_d"],
        opt_g=tx_g.init(bundle["params_g"]),
        opt_d=tx_d.init(bundle["params_d"]),
        confusion=M.empty_confusion(),
        epoch=jnp.int32(1),
    )




def make_epoch_fn(g: Module, d: Module, cfg: C2FConfig,
                  pool_size: Optional[int] = None, noise_sharding=None,
                  draw_n: Optional[int] = None):
    """``noise_sharding``: optional NamedSharding constraint on the
    image-shaped noise batches — required under a 2-D GSPMD mesh for the
    same partitioner conv-dW reason documented in
    train/step.py:make_train_step. ``draw_n``: true pool size to draw
    batch indices from when the pool arrives wrap-padded
    (parallel/gspmd.py shard_pool_2d)."""
    tx_d = _make_tx(cfg.d_optmethod, cfg, "D")
    tx_g = _make_tx(cfg.g_optmethod, cfg, "G")
    bs = cfg.batch_size
    half = bs // 2
    dtype = jnp.dtype(cfg.compute_dtype)
    fs, c = cfg.fine_size, cfg.channels
    n_steps = steps_per_epoch(cfg, pool_size)

    def noise(key, n):
        z = jax.random.uniform(key, (n, fs, fs, 1), dtype, -1.0, 1.0)
        if noise_sharding is not None:
            z = jax.lax.with_sharding_constraint(z, noise_sharding)
        return z

    # Boundary widening of the diff/coarse interface (the 7x7 256->C
    # output conv is the measured c2f bottleneck — 3/128 MXU lanes,
    # docs/KERNELS.md round 3/4): G_d's last conv gains zero output
    # lanes (pad diff channels come out exactly 0), real diffs and the
    # D-side coarse conditions gain zero channels (CAddTable pad sum =
    # 0), D_c's first conv gains zero input rows. G's own (noise,
    # coarse) inputs stay unpadded. Exact — see step.py.
    padder = make_boundary_padder(cfg)

    def _boundary(params_g, params_d):
        if padder is not None:
            _, ng = padder[0](params_g)
            _, nd = padder[1](params_d)
            if ng == 1 and nd >= 1 and not padder[3](params_d):
                return (lambda p: padder[0](p)[0],
                        lambda p: padder[1](p)[0], padder[2])
        ident = lambda p: p
        return ident, ident, ident

    def d_iteration(state: C2FState, rng, pool: C2FPool):
        k_real, k_fakecond, k_noise, k_gen, k_drop = jax.random.split(rng, 5)
        idx_real = jax.random.randint(k_real, (half,), 0, draw_n or pool.size)
        _, cond_real, diff_real = gather_triple(pool, idx_real, dtype)
        # fake half: fresh random coarse conditions (adversarial_c2f.lua:136-142)
        idx_fake = jax.random.randint(k_fakecond, (half,), 0, draw_n or pool.size)
        _, cond_fake, _ = gather_triple(pool, idx_fake, dtype)
        z = noise(k_noise, half)
        g_view, d_view, pad_imgs = _boundary(state.params_g, state.params_d)
        diff_fake, state_g = g.apply(g_view(state.params_g), state.state_g,
                                     (z, cond_fake), Ctx(k_gen, True))
        diff_fake = jax.lax.stop_gradient(diff_fake)

        diffs = jnp.concatenate([pad_imgs(diff_real), diff_fake], axis=0)
        conds = pad_imgs(jnp.concatenate([cond_real, cond_fake], axis=0))
        targets = jnp.concatenate(
            [jnp.ones((half,), jnp.float32), jnp.zeros((half,), jnp.float32)]
        )

        def loss_fn(params_d):
            logits, sd = d.apply(d_view(params_d), state.state_d, (diffs, conds),
                                 Ctx(k_drop, True))
            return losses.bce_with_logits(logits, targets), (logits, sd)

        (loss, (logits, state_d)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params_d)
        loss = loss + losses.penalty_loss(state.params_d, cfg.d_l1, cfg.d_l2)
        grads = losses.add_penalty_grads(grads, state.params_d, cfg.d_l1, cfg.d_l2)
        grads = losses.clamp_grads(grads, cfg.d_clamp)
        updates, opt_d = tx_d.update(grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
        acc = losses.batch_accuracy(logits, targets)
        conf = M.update_confusion(state.confusion, logits, targets)
        return state._replace(
            params_d=params_d, opt_d=opt_d, state_g=state_g, state_d=state_d,
            confusion=conf,
        ), loss, acc

    def g_iteration(state: C2FState, rng, pool: C2FPool):
        k_cond, k_noise, k_gen, k_drop = jax.random.split(rng, 4)
        idx = jax.random.randint(k_cond, (bs,), 0, draw_n or pool.size)
        _, conds, _ = gather_triple(pool, idx, dtype)
        z = noise(k_noise, bs)
        targets = jnp.ones((bs,), jnp.float32)
        g_view, d_view, pad_imgs = _boundary(state.params_g, state.params_d)
        conds_d = pad_imgs(conds)

        def loss_fn(params_g):
            diff, sg = g.apply(g_view(params_g), state.state_g, (z, conds),
                               Ctx(k_gen, True))
            logits, sd = d.apply(d_view(state.params_d), state.state_d,
                                 (diff, conds_d), Ctx(k_drop, True))
            return losses.bce_with_logits(logits, targets), (sg, sd)

        (loss, (state_g, state_d)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params_g)
        loss = loss + losses.penalty_loss(state.params_g, cfg.g_l1, cfg.g_l2)
        sign_coef = cfg.g_l2 if cfg.reference_g_penalty_bug else cfg.g_l1
        grads = losses.add_penalty_grads(grads, state.params_g, sign_coef, cfg.g_l2)
        grads = losses.clamp_grads(grads, cfg.g_clamp)
        updates, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        return state._replace(params_g=params_g, opt_g=opt_g,
                              state_g=state_g, state_d=state_d), loss

    def step(state, rng, pool):
        loss_d = jnp.float32(0.0)
        acc = jnp.float32(0.0)
        for k in range(cfg.d_iterations):
            state, loss_d, acc = d_iteration(state, jax.random.fold_in(rng, k), pool)
        loss_g = jnp.float32(0.0)
        for k in range(cfg.g_iterations):
            state, loss_g = g_iteration(state, jax.random.fold_in(rng, 1000 + k), pool)
        return state, C2FStepMetrics(loss_d, loss_g, acc)

    def epoch(state: C2FState, rng, pool: C2FPool):
        def body(carry, i):
            new_state, m = step(carry, jax.random.fold_in(rng, i), pool)
            return new_state, m

        state, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state._replace(epoch=state.epoch + 1), ms

    return epoch


def make_parzen_fn(g: Module, cfg: C2FConfig, nneighbors: int):
    """Batched approxParzen: (bundle-ish state, rng, val_pool) ->
    per-sample min distances (adversarial_c2f.lua:305-329)."""
    ns = cfg.parzen_samples
    dtype = jnp.dtype(cfg.compute_dtype)
    fs, c = cfg.fine_size, cfg.channels

    @jax.jit
    def parzen(params_g, state_g, rng, pool: C2FPool):
        k_pick, k_noise = jax.random.split(rng)
        idx = jax.random.randint(k_pick, (ns,), 0, pool.size)
        fine, coarse, _ = gather_triple(pool, idx, jnp.float32)
        z = jax.random.uniform(k_noise, (ns, nneighbors, fs, fs, 1), dtype, -1.0, 1.0)
        cond = jnp.broadcast_to(coarse[:, None].astype(dtype),
                                (ns, nneighbors, fs, fs, c))
        z_flat = z.reshape(ns * nneighbors, fs, fs, 1)
        cond_flat = cond.reshape(ns * nneighbors, fs, fs, c)
        diff, _ = g.apply(params_g, state_g, (z_flat, cond_flat), Ctx(None, False))
        refined = diff.astype(jnp.float32) + cond_flat.astype(jnp.float32)
        refined = refined.reshape(ns, nneighbors, -1)
        target = fine.reshape(ns, 1, -1)
        dists = jnp.sqrt(jnp.sum((refined - target) ** 2, axis=-1))
        return jnp.min(dists, axis=1)  # (ns,)

    return parzen


def ckpt_name(cfg: C2FConfig, best: bool = False) -> str:
    """adversarial_c2f_{coarse}_to_{fine}[.bestnet] (adversarial_c2f.lua:209,336)."""
    base = f"adversarial_c2f_{cfg.coarse_size}_to_{cfg.fine_size}"
    return base + ("_best" if best else "")


class C2FTrainer:
    """train_c2f.lua driver: epoch loop + approxParzen + best checkpoint."""

    def __init__(self, cfg: C2FConfig, source=None, verbose: bool = True,
                 mesh=None):
        from facegen.data.pipeline import DataSource, make_source

        self.cfg = cfg
        self.verbose = verbose
        self.mesh = mesh
        if source is None:
            # dedicated source at fine_size; first val_size images held out
            from facegen.config import TrainConfig

            tcfg = TrainConfig(
                scale=cfg.fine_size, grayscale=cfg.grayscale,
                synthetic_data=cfg.synthetic_data, dataset_dir=cfg.dataset_dir,
                aws=cfg.aws, threads=cfg.threads,
            )
            source = make_source(tcfg, holdout=cfg.val_size)
        self.source = source
        self.g, self.d, bundle = c2f_models.init_c2f(
            jax.random.key(cfg.seed), cfg.fine_size, cfg.channels
        )
        self.state = init_c2f_state(cfg, bundle)
        pool_n = cfg.n_epoch if cfg.n_epoch > 0 else source.size
        self.pool_n = pool_n
        if mesh is not None:
            # GSPMD path: params/opt sharded by the shape rule, pools on
            # "data"; exact single-device semantics (parallel/gspmd.py).
            from facegen.parallel import (
                ensure_mesh2d,
                make_gspmd_c2f_epoch,
                shard_state,
            )
            from facegen.parallel.multihost import warmup_collectives

            self.mesh = mesh = ensure_mesh2d(mesh)
            warmup_collectives(mesh)  # no-op single-process
            self.state = shard_state(self.state, mesh)
            self.epoch_fn = make_gspmd_c2f_epoch(self.g, self.d, cfg, mesh,
                                                 pool_n)
        else:
            self.epoch_fn = jax.jit(make_epoch_fn(self.g, self.d, cfg, pool_n))
        self.parzen_fn = make_parzen_fn(self.g, cfg, cfg.batch_size)
        self.best_dist = float("inf")
        # VAL_DATA = first 500 images (train_c2f.lua:218); train draws
        # skip them via the source holdout (startAt=500, :223)
        val_fine = source.range_pool(0, cfg.val_size, jax.random.key(cfg.seed + 7))
        self.val_pool = make_triples(val_fine, cfg.coarse_size)
        if cfg.network:
            self.resume(cfg.network)

    def resume(self, network: str):
        directory, name = ckpt.split_network_arg(network, self.cfg.save)
        # c2f resume restores OPTSTATE too (train_c2f.lua:109-116)
        self.state, meta = ckpt.load(directory, name, self.state)
        # restore the best-parzen watermark so a resumed run cannot
        # clobber a better historical .bestnet (its meta records parzen)
        best_meta_path = os.path.join(directory, ckpt_name(self.cfg, best=True),
                                      "meta.json")
        if os.path.exists(best_meta_path):
            import json

            with open(best_meta_path) as f:
                self.best_dist = float(
                    json.load(f).get("parzen", float("inf"))
                )
        self._log(f"<trainer> reloaded previously trained network: {network}")

    def get_samples_grid(self, key: jax.Array, n: int = 8) -> "np.ndarray":
        """The train_c2f.lua:187-216 5-tuple plot: for n validation
        examples, rows of (coarse | ground truth | refined | GT diff |
        G diff); returns the grid array and writes it from train_epoch."""
        from facegen.data.c2f import gather_triple
        from facegen.utils.grids import to_grid

        k_pick, k_noise = jax.random.split(key)
        idx = jax.random.randint(k_pick, (n,), 0, self.val_pool.size)
        fine, coarse, diff = gather_triple(self.val_pool, idx)
        fs, c = self.cfg.fine_size, self.cfg.channels
        z = jax.random.uniform(k_noise, (n, fs, fs, 1), jnp.float32, -1.0, 1.0)
        from facegen.nn.core import Ctx

        g_diff, _ = self.g.apply(self.state.params_g, self.state.state_g,
                                 (z, coarse), Ctx(None, False))
        refined = jnp.clip(coarse + g_diff, 0.0, 1.0)
        rows = []
        for i in range(n):
            rows += [
                np.asarray(coarse[i]),
                np.asarray(fine[i]),
                np.asarray(refined[i]),
                np.asarray(jnp.clip(diff[i] + 0.5, 0, 1)),      # signed -> mid-gray
                np.asarray(jnp.clip(g_diff[i] + 0.5, 0, 1)),
            ]
        return to_grid(np.stack(rows), nrow=5)

    def train_epoch(self, epoch_idx: int) -> dict:
        cfg = self.cfg
        key = jax.random.fold_in(jax.random.key(cfg.seed), 20_000 + epoch_idx)
        k_pool, k_epoch, k_parzen = jax.random.split(key, 3)
        self._log("Loading new training data...")
        fine = self.source.epoch_pool(k_pool, self.pool_n)
        pool = make_triples(fine, cfg.coarse_size)
        if self.mesh is not None:
            from facegen.parallel import shard_pool_2d

            pool = shard_pool_2d(pool, self.mesh)

        if not cfg.noplot:
            from facegen.utils.grids import save_png

            grid = self.get_samples_grid(jax.random.fold_in(key, 99), 20)
            save_png(os.path.join(cfg.save, "viz", "c2f_samples.png"), grid)

        t0 = time.perf_counter()
        self.state, ms = self.epoch_fn(self.state, k_epoch, pool)
        # one device->host fetch for every per-epoch scalar (individual
        # pulls are a remote round-trip each — see Trainer.train_epoch)
        loss_d_sum, loss_g_mean, acc_d_mean, conf, epoch_now = jax.device_get((
            jnp.sum(ms.loss_d), jnp.mean(ms.loss_g), jnp.mean(ms.acc_d),
            self.state.confusion, self.state.epoch,
        ))
        loss_d_sum, epoch_now = float(loss_d_sum), int(epoch_now)
        dt = time.perf_counter() - t0
        n_examples = cfg.n_epoch if cfg.n_epoch > 0 else self.pool_n
        self._log(f"<trainer> time required for this epoch = {dt:.3f} s")
        self._log(f"<trainer> time to learn 1 sample = {1000*dt/n_examples:.4f} ms")
        self._log(M.format_confusion(np.asarray(conf)))

        # approxParzen on validation (train_c2f.lua:235)
        dists = np.asarray(self.parzen_fn(self.state.params_g, self.state.state_g,
                                          k_parzen, self.val_pool))
        mean_dist = float(dists.mean())
        self._log(
            f"average || x_{cfg.fine_size} - G(x_{cfg.coarse_size}) || = {mean_dist:.5f}"
        )
        if mean_dist < self.best_dist:
            self.best_dist = mean_dist
            ckpt.save(cfg.save, ckpt_name(cfg, best=True), self.state,
                      meta={"epoch": epoch_now,
                            "parzen": mean_dist, **ckpt.config_meta(cfg)})
            self._log("<trainer> saving best network")

        stats = {
            "epoch": epoch_now - 1,
            "seconds": dt,
            "loss_d_mean": loss_d_sum / max(len(ms.loss_d), 1),
            "loss_g_mean": float(loss_g_mean),
            "acc_d_mean": float(acc_d_mean),
            "parzen": mean_dist,
        }
        self.state = self.state._replace(confusion=M.empty_confusion())
        if (epoch_now - 1) % cfg.save_freq == 0:
            ckpt.save(cfg.save, ckpt_name(cfg), self.state,
                      meta={"epoch": epoch_now, **ckpt.config_meta(cfg)})
        return stats

    def run(self, epochs: Optional[int] = None):
        n = epochs if epochs is not None else (
            self.cfg.epochs if self.cfg.epochs > 0 else None
        )
        # continue the per-epoch RNG stream from the restored epoch
        # counter (see Trainer.run) — a resumed run must not replay the
        # original run's pools/noise
        start = int(self.state.epoch) - 1
        i = 0
        while n is None or i < n:
            yield self.train_epoch(start + i)
            i += 1
        # bounded runs must not exit unsaved (see Trainer.run)
        if n is not None and (int(self.state.epoch) - 1) % self.cfg.save_freq != 0:
            ckpt.save(self.cfg.save, ckpt_name(self.cfg), self.state,
                      meta={"epoch": int(self.state.epoch),
                            **ckpt.config_meta(self.cfg)})

    def _log(self, msg):
        if self.verbose:
            print(msg, flush=True)
