"""Epoch driver — the functional replacement of train.lua:97-209.

Per epoch (train.lua:199-208):
  1. draw a fresh random HBM-resident pool (TRAIN_DATA equivalent);
  2. dump visualization grids + probe report (unless --noplot);
  3. run the compiled whole-epoch train function;
  4. print timing ("time to learn 1 sample"), gate counters and the
     confusion matrix (adversarial.lua:302-316), then reset them;
  5. every save_freq epochs: checkpoint with `.old` rotation
     (adversarial.lua:319-329).

Checkpoint resume restores models/optimizer/epoch (train.lua:114-129 —
NOTE the reference deliberately does NOT restore optimizer state, the
line is commented out at train.lua:122; we restore everything and
document the deviation: there is no reason to throw Adam moments away).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facegen.config import TrainConfig
from facegen.data.pipeline import DataSource, make_source
from facegen.models import gan
from facegen.train import metrics as M
from facegen.train.step import (
    GanState,
    init_state,
    make_epoch_fn,
    reset_epoch_stats,
    steps_per_epoch,
)
from facegen.utils import checkpoint as ckpt
from facegen.utils.infer import GanInference
from facegen.utils.viz import visualize_progress

CKPT_NAME = "adversarial"  # logs/adversarial.net equivalent


def _sync(x) -> float:
    """Reliable device barrier (block_until_ready is a no-op on the
    remote-tunnel backend): fetch a scalar."""
    return float(jnp.sum(x))


class Trainer:
    """Owns models, state, data source and the compiled epoch program."""

    def __init__(self, cfg: TrainConfig, source: Optional[DataSource] = None,
                 mesh=None, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        self.mesh = mesh
        self.source = source if source is not None else make_source(cfg)
        self.g, self.d, bundle = gan.init_gan(
            jax.random.key(cfg.seed), cfg.scale, cfg.channels, cfg.noise_dim,
            reference_init=cfg.reference_init, noise_view=cfg.noise_view,
        )
        self.state = init_state(cfg, bundle)
        self.inf = GanInference(self.g, self.d, cfg.noise_dim, cfg.compute_dtype)
        self.denoiser = None
        if cfg.denoise:
            self.denoiser = self._load_denoiser()

        pool_n = cfg.n_epoch if cfg.n_epoch > 0 else self.source.size
        self.pool_n = pool_n
        if mesh is not None:
            # multi-process: establish the collective clique with a tiny
            # all-reduce before the first minutes-long epoch compile
            # (multihost.warmup_collectives; no-op single-process)
            from facegen.parallel.multihost import warmup_collectives

            warmup_collectives(mesh)
        if mesh is not None and "model" in mesh.axis_names:
            # 2-D (data x model) GSPMD mesh: sharded params/opt state,
            # exact global-batch semantics (parallel/gspmd.py)
            from facegen.parallel import make_gspmd_epoch, shard_state

            self.state = shard_state(self.state, mesh)
            self.epoch_fn = make_gspmd_epoch(self.g, self.d, cfg, mesh,
                                             pool_size=pool_n)
        elif mesh is not None:
            from facegen.parallel import make_parallel_epoch, replicate

            self.state = replicate(self.state, mesh)
            self.epoch_fn = make_parallel_epoch(self.g, self.d, cfg, mesh,
                                                pool_size=pool_n)
        else:
            self.epoch_fn = jax.jit(make_epoch_fn(self.g, self.d, cfg,
                                                  pool_size=pool_n))
        # multi-epoch compiled driver (train/step.py:make_multi_epoch_fn):
        # one device program per N epochs amortizes host synchronization
        # (the dominant per-epoch overhead on high-latency-attach
        # backends). Auto mode engages it only when nothing needs a
        # per-epoch host visit (no viz, no segmented netvis cadence).
        epc = cfg.epochs_per_compile
        if epc <= 0:
            epc = 8 if (cfg.noplot and cfg.weights_vis_freq == 0
                        and not cfg.trace_dir) else 1
        if epc > 1 and cfg.weights_vis_freq > 0:
            self._log("<trainer> epochsPerCompile ignored: weightsVisFreq "
                      "needs the segmented per-epoch path")
            epc = 1
        if epc > 1 and cfg.trace_dir:
            self._log("<trainer> epochsPerCompile ignored: --traceDir "
                      "captures the per-epoch program")
            epc = 1
        if epc > 1 and mesh is not None and "model" in mesh.axis_names:
            self._log("<trainer> epochsPerCompile > 1 not supported on the "
                      "2-D GSPMD mesh; running per-epoch")
            epc = 1
        self.epochs_per_compile = epc
        self._multi_fns = {}
        # fixed noise vectors for comparable per-epoch samples
        # (train.lua:195: VIS_NOISE_INPUTS = createNoiseInputs(100))
        self.fixed_noise = self.inf.noise(jax.random.key(cfg.seed + 999), 100)
        from facegen.data.pipeline import Prefetcher

        self.prefetcher = Prefetcher(self.source, self.pool_n)

        from facegen.utils.profiling import MetricsLogger, enable_nan_debugging

        self.metrics_log = MetricsLogger(cfg.save)
        if cfg.debug_nans:
            enable_nan_debugging(True)

        if cfg.network:
            self.resume(cfg.network)

    # -- checkpointing ----------------------------------------------------
    def bundle(self) -> dict:
        return {
            "params_g": self.state.params_g,
            "state_g": self.state.state_g,
            "params_d": self.state.params_d,
            "state_d": self.state.state_d,
        }

    def save(self):
        path = ckpt.save(
            self.cfg.save, CKPT_NAME, self.state,
            meta={**ckpt.config_meta(self.cfg), "epoch": int(self.state.epoch)},
        )
        self._log(f"<trainer> saved checkpoint to {path}")

    def resume(self, network: str):
        """network may be a checkpoint dir path or a name under cfg.save;
        a reference-style `.net` suffix is tolerated."""
        directory, name = ckpt.split_network_arg(network, self.cfg.save)
        state, meta = ckpt.load(directory, name, self.state)
        # the nchw/nhwc noise views share an identical (parameter-free)
        # tree, so a mismatched resume cannot fail on shapes — it would
        # silently scramble the fc-to-plane wiring; every other config
        # mismatch fails loudly. Check it explicitly.
        ck_view = (meta or {}).get("config", {}).get("noise_view")
        cfg_view = getattr(self.cfg, "noise_view", None)
        if ck_view is not None and cfg_view is not None and ck_view != cfg_view:
            raise ValueError(
                f"checkpoint {network!r} was trained with "
                f"noise_view={ck_view!r} but this run uses "
                f"noise_view={cfg_view!r}; pass the matching --noiseView"
            )
        self.state = state
        self._log(
            f"<trainer> reloaded previously trained network: {network} "
            f"(epoch {int(self.state.epoch)})"
        )

    def _load_denoiser(self):
        from facegen.models.ae import load_denoiser_fn

        return load_denoiser_fn(self.cfg)

    # -- training ---------------------------------------------------------
    def _epoch_keys(self, epoch_idx: int):
        """Per-epoch (k_pool, k_epoch, k_viz) — one derivation shared by
        the sequential and multi-epoch paths so both modes consume the
        same RNG stream."""
        key = jax.random.fold_in(jax.random.key(self.cfg.seed),
                                 10_000 + epoch_idx)
        return jax.random.split(key, 3)

    def train_epoch(self, epoch_idx: int) -> dict:
        cfg = self.cfg
        k_pool, k_epoch, k_viz = self._epoch_keys(epoch_idx)

        self._log("Loading new training data...")
        pool = self.prefetcher.get(k_pool)
        # overlap the NEXT epoch's pool build with this epoch's training
        self.prefetcher.schedule(self._epoch_keys(epoch_idx + 1)[0])
        if self.mesh is not None and "model" in self.mesh.axis_names:
            from facegen.parallel import shard_pool_2d

            pool = shard_pool_2d(pool, self.mesh)
        elif self.mesh is not None:
            from facegen.parallel import shard_pool

            pool = shard_pool(pool, self.mesh)

        if not cfg.noplot:
            out_dir = os.path.join(cfg.save, "viz")
            report = visualize_progress(
                self.inf, self.bundle(), self.fixed_noise, pool, out_dir,
                k_viz, denoiser=self.denoiser, epoch=int(self.state.epoch),
                window=cfg.window,
            )
            self._log(
                f"<viz> probe ranks/300: real={report['real_probe_rank']} "
                f"synth={report['synth_probe_rank']}"
            )

        n_steps = steps_per_epoch(cfg, self.pool_n)
        self._log(
            f"<trainer> Epoch #{int(self.state.epoch)} "
            f"[batchSize = {cfg.batch_size}]"
        )
        t0 = time.perf_counter()
        if cfg.trace_dir and epoch_idx == 1:
            # trace the second epoch (first is compile)
            from facegen.utils.profiling import trace

            with trace(cfg.trace_dir):
                self.state, ms = self.epoch_fn(self.state, k_epoch, pool)
                loss_d_sum = _sync(ms.loss_d)
            if cfg.weights_vis_freq > 0:
                # traced epochs run the whole-epoch program (that is what
                # is being profiled); dump once so the cadence record
                # isn't empty for this epoch
                self._netvis_dump(pool, k_viz, n_steps)
        elif cfg.weights_vis_freq > 0:
            ms = self._segmented_epoch(k_epoch, pool, n_steps)
            loss_d_sum = _sync(ms.loss_d)
        else:
            self.state, ms = self.epoch_fn(self.state, k_epoch, pool)
            loss_d_sum = _sync(ms.loss_d)  # forces completion
        dt = time.perf_counter() - t0

        n_examples = cfg.n_epoch if cfg.n_epoch > 0 else self.pool_n
        # one device->host fetch for all per-epoch scalars (each
        # individual int()/float() pull is a tunnel round-trip)
        trained, not_trained, conf, loss_g_mean, acc_d_mean, epoch_now = (
            jax.device_get((
                self.state.trained_d, self.state.not_trained_d,
                self.state.confusion, jnp.mean(ms.loss_g),
                jnp.mean(ms.acc_d), self.state.epoch,
            )))
        trained, not_trained = int(trained), int(not_trained)
        epoch_now = int(epoch_now)
        conf = np.asarray(conf)
        total_valid = float(M.total_valid(conf))
        self._log(f"<trainer> time required for this epoch = {dt:.3f} s")
        self._log(f"<trainer> time to learn 1 sample = {1000*dt/n_examples:.4f} ms")
        self._log(f"<trainer> trained D {trained} of {trained+not_trained} times.")
        self._log(M.format_confusion(conf))

        stats = {
            "epoch": epoch_now - 1,
            "seconds": dt,
            "images_per_sec": n_examples / dt,
            "loss_d_mean": loss_d_sum / max(len(ms.loss_d), 1),
            "loss_g_mean": float(loss_g_mean),
            "acc_d_mean": float(acc_d_mean),
            "total_valid": total_valid,
            "trained_d": trained,
            "not_trained_d": not_trained,
        }
        self.state = reset_epoch_stats(self.state)
        self.metrics_log.log(stats)

        if (epoch_now - 1) % self.cfg.save_freq == 0:
            self.save()
        return stats

    def _multi_fn(self, n: int):
        """Compiled n-epoch driver, cached per chunk size (a bounded
        run's tail chunk pays one extra compile, like the segmented
        path's remainder)."""
        if n not in self._multi_fns:
            from facegen.train.step import make_multi_epoch_fn

            if self.mesh is not None:
                from facegen.parallel import make_parallel_multi_epoch

                self._multi_fns[n] = make_parallel_multi_epoch(
                    self.g, self.d, self.cfg, self.mesh, n,
                    pool_size=self.pool_n)
            else:
                self._multi_fns[n] = jax.jit(make_multi_epoch_fn(
                    self.g, self.d, self.cfg, n, pool_size=self.pool_n))
        return self._multi_fns[n]

    def train_epochs_chunk(self, start_idx: int, n: int) -> list:
        """Train ``n`` epochs in ONE device program (--epochsPerCompile;
        train/step.py:make_multi_epoch_fn). Per-epoch keys and pools are
        built exactly as the sequential path builds them, so the RNG
        stream matches train_epoch-by-train_epoch; one metrics.jsonl row
        is still written per epoch. Visualization (unless --noplot) runs
        once per chunk, at the chunk boundary."""
        cfg = self.cfg
        keys = [self._epoch_keys(start_idx + j) for j in range(n)]

        self._log("Loading new training data...")
        if self.source.device_store is not None:
            # HBM-resident store: the whole chunk's pools in ONE device
            # program (pipeline.py:_pools_from_device_store), row-for-row
            # identical to the sequential per-epoch builds
            pools = self.source.epoch_pool_stack(
                jnp.stack([k[0] for k in keys]), self.pool_n)
        else:
            pools = []
            for j in range(n):
                pool = self.prefetcher.get(keys[j][0])
                self.prefetcher.schedule(self._epoch_keys(start_idx + j + 1)[0])
                pools.append(pool)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nshards = self.mesh.shape["data"]
            usable = (pools[0].shape[0] // nshards) * nshards
            stacked = (pools[:, :usable] if isinstance(pools, jax.Array)
                       else jnp.stack([p[:usable] for p in pools]))
            if any(d.process_index != jax.process_index()
                   for d in self.mesh.devices.flat):
                # multi-process mesh: device_put cannot target other
                # hosts' chips; build the global array from this host's
                # addressable shards (same route as mesh.py:shard_pool)
                from facegen.parallel.multihost import global_put

                stacked = global_put(stacked, self.mesh, P(None, "data"))
            else:
                stacked = jax.device_put(
                    stacked, NamedSharding(self.mesh, P(None, "data")))
        else:
            stacked = pools if isinstance(pools, jax.Array) else jnp.stack(pools)

        if not cfg.noplot:
            report = visualize_progress(
                self.inf, self.bundle(), self.fixed_noise, pools[0],
                os.path.join(cfg.save, "viz"), keys[0][2],
                denoiser=self.denoiser, epoch=int(self.state.epoch),
                window=cfg.window,
            )
            self._log(
                f"<viz> probe ranks/300: real={report['real_probe_rank']} "
                f"synth={report['synth_probe_rank']}"
            )
        del pools

        epoch_before = int(self.state.epoch)
        self._log(
            f"<trainer> Epochs #{epoch_before}-#{epoch_before + n - 1} "
            f"[batchSize = {cfg.batch_size}, epochsPerCompile = {n}]"
        )
        k_epochs = jnp.stack([k[1] for k in keys])
        t0 = time.perf_counter()
        self.state, summaries = self._multi_fn(n)(self.state, k_epochs, stacked)
        # ONE device->host fetch for the whole chunk's summaries (also
        # forces completion): per-element indexing of device arrays
        # would cost a tunnel round-trip per scalar — ~8 x n of them
        summaries = jax.device_get(summaries)
        dt = time.perf_counter() - t0

        n_examples = cfg.n_epoch if cfg.n_epoch > 0 else self.pool_n
        self._log(f"<trainer> time required for {n} epochs = {dt:.3f} s")
        self._log(
            f"<trainer> time to learn 1 sample = {1000*dt/(n*n_examples):.4f} ms")
        all_stats = []
        for j in range(n):
            trained = int(summaries.trained_d[j])
            not_trained = int(summaries.not_trained_d[j])
            self._log(f"<trainer> epoch #{epoch_before + j}: trained D "
                      f"{trained} of {trained + not_trained} times.")
            self._log(M.format_confusion(np.asarray(summaries.confusion[j])))
            stats = {
                "epoch": epoch_before + j,
                "seconds": dt / n,
                "images_per_sec": n * n_examples / dt,
                "loss_d_mean": float(summaries.loss_d[j]),
                "loss_g_mean": float(summaries.loss_g[j]),
                "acc_d_mean": float(summaries.acc_d[j]),
                "total_valid": float(summaries.total_valid[j]),
                "trained_d": trained,
                "not_trained_d": not_trained,
            }
            self.metrics_log.log(stats)
            all_stats.append(stats)

        # save once per chunk if any saveFreq boundary was crossed
        # (adversarial.lua:319 saves every saveFreq epochs; intermediate
        # states no longer exist on host, so the latest state is saved)
        if any((epoch_before + j) % cfg.save_freq == 0 for j in range(n)):
            self.save()
        return all_stats

    def _segmented_epoch(self, rng, pool, n_steps: int):
        """Run one epoch as weights_vis_freq-sized segments, dumping D
        activation grids at each boundary (adversarial.lua:296-299's
        per-batch cadence). rng folding is by global step index, so the
        math matches the single-scan epoch (same RNG stream)."""
        import jax.numpy as jnp

        from facegen.train.step import make_segment_fn

        if not hasattr(self, "_segment_fn"):
            if self.mesh is not None and "model" in self.mesh.axis_names:
                from facegen.parallel import make_gspmd_segment

                self._segment_fn = make_gspmd_segment(
                    self.g, self.d, self.cfg, self.mesh, draw_n=self.pool_n
                )
            elif self.mesh is not None:
                from facegen.parallel import make_parallel_segment

                self._segment_fn = make_parallel_segment(
                    self.g, self.d, self.cfg, self.mesh
                )
            else:
                self._segment_fn = jax.jit(make_segment_fn(self.g, self.d, self.cfg))
        freq = self.cfg.weights_vis_freq
        ms_parts = []
        done = 0
        while done < n_steps:
            seg = min(freq, n_steps - done)
            self.state, ms = self._segment_fn(
                self.state, rng, pool, jnp.arange(done, done + seg)
            )
            ms_parts.append(ms)
            done += seg
            self._netvis_dump(pool, jax.random.fold_in(rng, 77), done)
        self.state = self.state._replace(epoch=self.state.epoch + 1)
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *ms_parts)

    def _netvis_dump(self, pool, key, step_idx: int):
        """Activation-grid dump (visualizeNetwork, adversarial.lua:348-406).

        The reference dumps D's top-level layer outputs; like it, nested
        branch layers are not descended into (SURVEY.md quirk b) — which
        leaves the 16px D16d with nothing at top level, so we dump G's
        pyramid too (always conv-bearing at top level)."""
        import jax.numpy as jnp

        from facegen.utils.netvis import visualize_network

        out_dir = os.path.join(self.cfg.save, "viz", "netvis",
                               f"e{int(self.state.epoch):04d}_s{step_idx:05d}")
        probe = pool[: min(4, pool.shape[0])].astype(jnp.float32) / 255.0
        visualize_network(self.d, self.state.params_d, self.state.state_d,
                          probe, out_dir, key=key)
        noise = self.fixed_noise[: probe.shape[0]]
        visualize_network(self.g, self.state.params_g, self.state.state_g,
                          noise, os.path.join(out_dir, "g"), key=key)

    def run(self, epochs: Optional[int] = None):
        """The `while true` loop (train.lua:199-208); epochs=None runs
        forever like the reference. A finite run checkpoints once more at
        the end (the reference only saves every saveFreq epochs because
        it never terminates; a bounded run must not exit unsaved).

        With epochsPerCompile > 1, epochs are trained in compiled chunks
        (train_epochs_chunk) but still yielded one stats dict per epoch.

        The per-epoch RNG index continues from the restored epoch
        counter, so a resumed run (--network) draws FRESH pools and
        noise instead of replaying the original run's stream (the
        invariant: RNG index == global epoch number - 1, fresh or
        resumed).
        """
        n = epochs if epochs is not None else (
            self.cfg.epochs if self.cfg.epochs > 0 else None
        )
        epc = max(self.epochs_per_compile, 1)
        start = int(self.state.epoch) - 1
        i = 0
        while n is None or i < n:
            chunk = epc if n is None else min(epc, n - i)
            if chunk <= 1:
                yield self.train_epoch(start + i)
            else:
                yield from self.train_epochs_chunk(start + i, chunk)
            i += chunk
        if n is not None and (int(self.state.epoch) - 1) % self.cfg.save_freq != 0:
            self.save()

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)


def main(argv=None):
    from facegen.config import train_config_from_args
    from facegen.parallel.multihost import maybe_initialize

    # env-gated multi-process entry (FACEGEN_COORDINATOR et al.); must
    # run before the first jax.devices() touch binds the backend client.
    # A no-op for ordinary single-process runs (parallel/multihost.py).
    # After initialize, jax.devices() is global and the default
    # mesh_shape=(-1,) below spans every process's chips — launching
    # processes IS the opt-in to multi-host data parallelism.
    maybe_initialize()
    cfg = train_config_from_args(argv)
    mesh = None
    if len(jax.devices()) > 1:
        if len(cfg.mesh_shape) == 2:
            # 'DP,MP' (incl. MP=1 and DP=-1) = the GSPMD mesh
            from facegen.parallel import mesh2d_from_shape

            mesh = mesh2d_from_shape(cfg.mesh_shape)
        else:
            # bare 'N' = shard_map local-batch data parallelism
            from facegen.parallel import make_mesh

            mesh = make_mesh(cfg.mesh_shape)
    trainer = Trainer(cfg, mesh=mesh)
    print(f"Number of free parameters in D: "
          f"{sum(l.size for l in jax.tree.leaves(trainer.state.params_d))}")
    print(f"Number of free parameters in G: "
          f"{sum(l.size for l in jax.tree.leaves(trainer.state.params_g))}")
    for _stats in trainer.run():
        pass


if __name__ == "__main__":
    main()
