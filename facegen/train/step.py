"""The jitted GAN train step and whole-epoch scan.

This is the TPU-native redesign of the reference hot loop
(adversarial.lua:54-300, SURVEY.md section 3.1). Key differences, each
deliberate:

- The WHOLE EPOCH is one compiled program: `lax.scan` over steps inside
  a single jit/shard_map. The reference dispatches per batch from Lua
  and crosses host<->device on every forward (nn_utils.lua:357-359); we
  keep the epoch data pool, params, optimizer state, and the rolling
  accuracy gate HBM-resident for the entire epoch.
- The D accuracy gate (adversarial.lua:154-178) is carried state: a ring
  buffer of per-batch accuracies + a masked optimizer update
  (train/optim.py:gated_update). Skipped updates advance neither params
  nor Adam moments, exactly like interruptable_optimizers.lua.
- Static shapes: every batch is full-size. The reference shrinks the
  tail batch (adversarial.lua:56); under XLA that would force a recompile
  per shape, so we run floor/ceil full batches instead (examples are
  drawn randomly either way, adversarial.lua:245).
- Data parallelism: pass ``axis_name`` to psum-mean gradients and gate
  statistics over the mesh. The gate decision is made on the GLOBAL
  accuracy so every chip takes the same branch (SURVEY.md section 7).

Batch semantics parity (adversarial.lua:54-76, 240-288): the loop
advances by batchSize/2; each D iteration sees batchSize inputs = half
real (uniform random draws from the pool) + half G samples; each G
iteration uses batchSize fresh noise vectors with all-real targets.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from facegen.config import TrainConfig
from facegen.nn.core import Ctx, Module
from facegen.train import losses, metrics
from facegen.train.optim import gated_update, make_optimizer


class GanState(NamedTuple):
    """Everything the training loop carries across steps/epochs.

    Replaces the reference's globals MODEL_G/MODEL_D/OPTSTATE/CONFUSION/
    adversarial.accs/EPOCH (train.lua:89-94, adversarial.lua:12).
    """

    params_g: Any
    state_g: Any
    params_d: Any
    state_d: Any
    opt_g: Any
    opt_d: Any
    accs: jax.Array        # (accs_interval,) f32 ring buffer of D batch accs
    accs_n: jax.Array      # i32 total accs pushed (ring head = accs_n % K)
    confusion: jax.Array   # (2,2) i32, reset each epoch (adversarial.lua:316)
    trained_d: jax.Array   # i32 gate-open counter (adversarial.lua:306)
    not_trained_d: jax.Array
    epoch: jax.Array       # i32, 1-based like the reference


class StepMetrics(NamedTuple):
    loss_d: jax.Array
    loss_g: jax.Array
    acc_d: jax.Array       # current-batch D accuracy
    gate_open: jax.Array   # f32 0/1: whether D trained this step


def init_state(cfg: TrainConfig, bundle: dict) -> GanState:
    tx_d = make_optimizer(cfg.d_optmethod, cfg, "D")
    tx_g = make_optimizer(cfg.g_optmethod, cfg, "G")
    return GanState(
        params_g=bundle["params_g"],
        state_g=bundle["state_g"],
        params_d=bundle["params_d"],
        state_d=bundle["state_d"],
        opt_g=tx_g.init(bundle["params_g"]),
        opt_d=tx_d.init(bundle["params_d"]),
        accs=jnp.zeros((cfg.accs_interval,), jnp.float32),
        accs_n=jnp.int32(0),
        confusion=metrics.empty_confusion(),
        trained_d=jnp.int32(0),
        not_trained_d=jnp.int32(0),
        epoch=jnp.int32(1),
    )


def steps_per_epoch(cfg: TrainConfig, pool_size: Optional[int] = None) -> int:
    """Number of optimizer steps in one epoch.

    Reference: for t = 1, N_epoch, batchSize/2, skipping tail batches
    smaller than 4 (adversarial.lua:54-76). N_epoch <= 0 means the whole
    dataset (adversarial.lua:33-35).
    """
    n = cfg.n_epoch if cfg.n_epoch > 0 else (pool_size or 0)
    half = cfg.batch_size // 2
    count = 0
    t = 1
    while t <= n:
        if min(cfg.batch_size, n - t + 1) >= 4:
            count += 1
        t += half
    return max(count, 1)


def _psum_mean(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.tree.map(lambda x: lax.pmean(x, axis_name), tree)


def _pad_conv_layers(params, axis: int, channels: int, pad: int):
    """Zero-pad every conv layer whose 4-D ``w`` has ``channels`` entries
    on ``axis`` (3 = output channels, 2 = input channels) by ``pad``
    extra lanes; biases pad alongside output channels. Returns
    (new_params, n_padded).

    This is the exact-reparameterization half of the boundary-channel
    widening (docs/KERNELS.md round 4): C=3/C=1 image-boundary convs
    occupy 3/128 MXU output lanes; padding the WEIGHTS (not the stored
    parameters) keeps the checkpoint/optimizer/penalty math untouched
    while the compiled program runs lane-friendly convs. Under jax.grad
    the pad's adjoint is a slice, so weight gradients are bitwise those
    of the unpadded layer.
    """
    n = 0

    def rec(node):
        nonlocal n
        if not isinstance(node, dict):
            return node
        w = node.get("w")
        if (hasattr(w, "ndim") and w.ndim == 4 and w.shape[axis] == channels):
            n += 1
            widths = [(0, 0)] * 4
            widths[axis] = (0, pad)
            new = {"w": jnp.pad(w, widths)}
            for k, v in node.items():
                if k == "w":
                    continue
                if k == "b" and axis == 3:
                    new[k] = jnp.pad(v, [(0, pad)])
                else:
                    new[k] = rec(v) if isinstance(v, dict) else v
            return new
        return {k: rec(v) for k, v in node.items()}

    return rec(params), n


def make_boundary_padder(cfg, channels: Optional[int] = None,
                         scale: Optional[int] = None):
    """Build (pad_g, pad_d, pad_imgs, d_flattens_image) or None.

    Accepts any config with a ``boundary_pad`` field (TrainConfig or
    C2FConfig — the c2f engine pads its diff/coarse interface the same
    way, train/c2f.py); ``channels``/``scale`` default to the config's.

    The G->D image interface is ``channels`` wide (3 color / 1
    gray); ``boundary_pad`` widens it to P channels end-to-end inside
    the compiled step: G's output conv gains P-C zero output lanes
    (pad channels come out as sigmoid(0)=0.5), real images gain P-C
    zero channels, and D's first conv gains P-C zero INPUT rows — so
    every logit, loss, gradient and running statistic is exactly the
    unpadded computation (zero weights x anything = 0, and the pads'
    weight gradients are sliced away by AD). Applies only when both
    models expose a PURE conv boundary: the flat-G variant has no
    output conv, and the 16px Ds flatten the raw image into a dense
    branch (models.lua:286-299) — `flatten_in` lets the trace-time gate
    detect that consumer and fall back to the identity.
    """
    channels = cfg.channels if channels is None else channels
    scale = getattr(cfg, "scale", getattr(cfg, "fine_size", 0)) \
        if scale is None else scale
    pad = cfg.boundary_pad - channels
    if cfg.boundary_pad <= 0 or pad <= 0:
        return None

    def pad_g(params_g):
        return _pad_conv_layers(params_g, 3, channels, pad)

    def pad_d(params_d):
        return _pad_conv_layers(params_d, 2, channels, pad)

    def pad_imgs(x):
        return jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, pad)])

    flatten_in = scale * scale * channels

    def d_flattens_image(params_d) -> bool:
        return any(
            getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] == flatten_in
            for leaf in jax.tree.leaves(params_d)
        )

    return pad_g, pad_d, pad_imgs, d_flattens_image


def make_train_step(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    num_shards: int = 1,
    axis_name: Optional[str] = None,
    noise_sharding=None,
    draw_n: Optional[int] = None,
):
    """Build ``step(state, rng, pool) -> (state, StepMetrics)``.

    ``pool`` is the (per-shard) epoch data: (P, H, W, C) uint8, the
    HBM-resident equivalent of TRAIN_DATA (train.lua:201). uint8 keeps
    HBM footprint minimal; the cast to compute dtype happens on-chip at
    batch-gather time.

    ``noise_sharding``: optional NamedSharding applied (via
    with_sharding_constraint) to the internally generated noise batches.
    Required on a 2-D GSPMD mesh (parallel/gspmd.py): without it the
    partitioner leaves the noise -> G chain replicated over the data
    axis and MISCOMPILES the conv weight gradients to dp * their true
    value (reproduced on jax 0.9 CPU with both the GSPMD and Shardy
    partitioners whenever both mesh axes are non-trivial; dense/matmul
    gradients are unaffected). Sharding the batch axis explicitly both
    avoids the bug and is the layout you want anyway.

    ``draw_n``: optional true pool size to draw batch indices from —
    set when the pool arrives wrap-padded to a device-count multiple
    (parallel/gspmd.py shard_pool_2d) so padded rows are never sampled
    and the draws match the single-device program exactly.
    """
    assert cfg.batch_size % (2 * num_shards) == 0, (
        "global batch must split evenly into half-real/half-fake per shard"
    )
    tx_d = make_optimizer(cfg.d_optmethod, cfg, "D")
    tx_g = make_optimizer(cfg.g_optmethod, cfg, "G")
    local_bs = cfg.batch_size // num_shards
    half = local_bs // 2
    dtype = jnp.dtype(cfg.compute_dtype)
    k_ring = cfg.accs_interval

    def _constrain(z):
        if noise_sharding is None:
            return z
        return lax.with_sharding_constraint(z, noise_sharding)

    padder = make_boundary_padder(cfg)

    def _boundary(params_g, params_d):
        """Trace-time decision: both nets must expose a conv image
        boundary (e.g. the flat-G variant has none) or padding is off.
        Returns (g_view, d_view, pad_imgs) where the views are functions
        params -> padded-weight params (identity when off) — d_view must
        run INSIDE the D loss so AD slices the pad's weight grads."""
        if padder is not None:
            _, ng = padder[0](params_g)
            _, nd = padder[1](params_d)
            if ng == 1 and nd >= 1 and not padder[3](params_d):
                return (lambda p: padder[0](p)[0],
                        lambda p: padder[1](p)[0], padder[2])
        ident = lambda p: p
        return ident, ident, ident

    def d_iteration(state: GanState, rng: jax.Array, pool: jax.Array):
        g_view, d_view, pad_imgs = _boundary(state.params_g, state.params_d)
        k_idx, k_noise, k_gen, k_drop = jax.random.split(rng, 4)
        idx = jax.random.randint(k_idx, (half,), 0, draw_n or pool.shape[0])
        real = pad_imgs(pool[idx].astype(dtype) / jnp.asarray(255.0, dtype))
        noise = _constrain(
            jax.random.uniform(k_noise, (half, cfg.noise_dim), dtype, -1.0, 1.0)
        )
        # G forward in train mode: BN running stats update, like
        # createImages under net:training() (adversarial.lua:252).
        # cfg.g_train_in_d_phase=False is the ablation that freezes G's
        # BN stats while making D's fakes (ROUND5 convergence study).
        fake, state_g = g.apply(g_view(state.params_g), state.state_g, noise,
                                Ctx(k_gen, cfg.g_train_in_d_phase))
        fake = lax.stop_gradient(fake)
        inputs = jnp.concatenate([real, fake], axis=0)
        targets = jnp.concatenate(
            [jnp.ones((half,), jnp.float32), jnp.zeros((half,), jnp.float32)]
        )

        def loss_fn(params_d):
            logits, sd = d.apply(d_view(params_d), state.state_d, inputs,
                                 Ctx(k_drop, True))
            return losses.bce_with_logits(logits, targets), (logits, sd)

        (loss, (logits, state_d)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_d
        )
        # Keep carried state replicated across shards: running BN stats
        # are pmean'd (sync-BN on the running estimates).
        state_g = _psum_mean(state_g, axis_name)
        state_d = _psum_mean(state_d, axis_name)
        grads = _psum_mean(grads, axis_name)
        loss = _psum_mean(loss, axis_name)
        loss = loss + losses.penalty_loss(state.params_d, cfg.d_l1, cfg.d_l2)
        grads = losses.add_penalty_grads(grads, state.params_d, cfg.d_l1, cfg.d_l2)
        grads = losses.clamp_grads(grads, cfg.d_clamp)

        acc = _psum_mean(losses.batch_accuracy(logits, targets), axis_name)
        conf_delta = metrics.update_confusion(
            jnp.zeros((2, 2), jnp.int32), logits, targets
        )
        if axis_name is not None:
            conf_delta = lax.psum(conf_delta, axis_name)

        # ring-buffer push + rolling mean (adversarial.lua:154-167)
        slot = state.accs_n % k_ring
        accs = state.accs.at[slot].set(acc)
        accs_n = state.accs_n + 1
        count = jnp.minimum(accs_n, k_ring).astype(jnp.float32)
        acc_avg = jnp.sum(accs) / count
        do_train = acc_avg < cfg.d_max_acc
        if cfg.guard_nonfinite:
            finite = jnp.all(
                jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(grads)])
            )
            do_train = do_train & finite

        params_d, opt_d = gated_update(tx_d, grads, state.opt_d, state.params_d, do_train)

        state = state._replace(
            params_d=params_d,
            opt_d=opt_d,
            state_g=state_g,
            state_d=state_d,
            accs=accs,
            accs_n=accs_n,
            confusion=state.confusion + conf_delta,
            trained_d=state.trained_d + do_train.astype(jnp.int32),
            not_trained_d=state.not_trained_d + (1 - do_train.astype(jnp.int32)),
        )
        return state, loss, acc, do_train

    def g_iteration(state: GanState, rng: jax.Array):
        g_view, d_view, _ = _boundary(state.params_g, state.params_d)
        k_noise, k_gen, k_drop = jax.random.split(rng, 3)
        noise = _constrain(
            jax.random.uniform(k_noise, (local_bs, cfg.noise_dim), dtype, -1.0, 1.0)
        )
        targets = jnp.ones((local_bs,), jnp.float32)  # Y_NOT_GENERATOR

        def loss_fn(params_g):
            imgs, sg = g.apply(g_view(params_g), state.state_g, noise,
                               Ctx(k_gen, True))
            logits, sd = d.apply(d_view(state.params_d), state.state_d, imgs,
                                 Ctx(k_drop, True))
            return losses.bce_with_logits(logits, targets), (sg, sd)

        (loss, (state_g, state_d)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_g
        )
        state_g = _psum_mean(state_g, axis_name)
        state_d = _psum_mean(state_d, axis_name)
        grads = _psum_mean(grads, axis_name)
        loss = _psum_mean(loss, axis_name)
        loss = loss + losses.penalty_loss(state.params_g, cfg.g_l1, cfg.g_l2)
        # reference bug (adversarial.lua:223): gradient uses G_L2 twice
        sign_coef = cfg.g_l2 if cfg.reference_g_penalty_bug else cfg.g_l1
        grads = losses.add_penalty_grads(grads, state.params_g, sign_coef, cfg.g_l2)
        grads = losses.clamp_grads(grads, cfg.g_clamp)

        do_update = jnp.bool_(True)
        if cfg.guard_nonfinite:
            do_update = jnp.all(
                jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(grads)])
            )
        params_g, opt_g = gated_update(tx_g, grads, state.opt_g, state.params_g,
                                       do_update)
        state = state._replace(
            params_g=params_g, opt_g=opt_g, state_g=state_g, state_d=state_d
        )
        return state, loss

    def step(state: GanState, rng: jax.Array, pool: jax.Array):
        loss_d = jnp.float32(0.0)
        acc = jnp.float32(0.0)
        gate = jnp.bool_(False)
        for k in range(cfg.d_iterations):
            state, loss_d, acc, gate = d_iteration(
                state, jax.random.fold_in(rng, k), pool
            )
        loss_g = jnp.float32(0.0)
        for k in range(cfg.g_iterations):
            state, loss_g = g_iteration(state, jax.random.fold_in(rng, 1000 + k))
        return state, StepMetrics(loss_d, loss_g, acc, gate.astype(jnp.float32))

    return step


def make_epoch_fn(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    num_shards: int = 1,
    axis_name: Optional[str] = None,
    pool_size: Optional[int] = None,
    noise_sharding=None,
    draw_n: Optional[int] = None,
):
    """Build ``epoch(state, rng, pool) -> (state, stacked StepMetrics)``
    — one `lax.scan` over all steps of an epoch, jit- or shard_map-ready.

    The confusion matrix and D-trained counters accumulate across the
    epoch; the caller prints and resets them (adversarial.lua:302-316).
    """
    step = make_train_step(g, d, cfg, num_shards, axis_name, noise_sharding,
                           draw_n)
    n_steps = steps_per_epoch(cfg, pool_size)

    def epoch(state: GanState, rng: jax.Array, pool: jax.Array):
        def body(carry, i):
            new_state, m = step(carry, jax.random.fold_in(rng, i), pool)
            return new_state, m

        # unroll=2 lets XLA software-pipeline adjacent steps (~4% at
        # batch 32; measured, larger unrolls don't help further)
        state, ms = lax.scan(body, state, jnp.arange(n_steps), unroll=2)
        state = state._replace(epoch=state.epoch + 1)
        return state, ms

    return epoch


def make_segment_fn(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    num_shards: int = 1,
    axis_name: Optional[str] = None,
    noise_sharding=None,
    draw_n: Optional[int] = None,
):
    """Build ``segment(state, rng, pool, offsets) -> (state, StepMetrics)``
    — a scan over an arbitrary contiguous slice of an epoch's steps.

    ``offsets`` are the global step indices (e.g. jnp.arange(4, 8)); rng
    folding is by global index, so running an epoch as consecutive
    segments reproduces `make_epoch_fn`'s math exactly (same
    RNG stream; bit-level may differ across differently-fused programs). This restores the
    reference's `weightsVisFreq` semantics (adversarial.lua:296-299:
    activation dumps every N *batches*) under whole-epoch compilation:
    the driver splits the epoch at the dump boundaries and pays at most
    two compiles (full segment + remainder). The epoch counter is NOT
    advanced — the caller increments it after the last segment.
    """
    step = make_train_step(g, d, cfg, num_shards, axis_name, noise_sharding,
                           draw_n)

    def segment(state: GanState, rng: jax.Array, pool: jax.Array,
                offsets: jax.Array):
        def body(carry, i):
            return step(carry, jax.random.fold_in(rng, i), pool)

        return lax.scan(body, state, offsets, unroll=2)

    return segment


class EpochSummary(NamedTuple):
    loss_d: jax.Array       # epoch means
    loss_g: jax.Array
    acc_d: jax.Array
    total_valid: jax.Array  # confusion accuracy over the epoch
    trained_d: jax.Array
    not_trained_d: jax.Array
    confusion: jax.Array    # (2,2) i32 per-epoch confusion matrix


def make_multi_epoch_fn(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    n_epochs: int,
    num_shards: int = 1,
    axis_name: Optional[str] = None,
    pool_size: Optional[int] = None,
):
    """Compile ``n_epochs`` epochs into ONE program: (state, rng, pools)
    -> (state, stacked EpochSummary), where pools is (n_epochs, P, H, W,
    C) uint8 — one fresh pool per epoch, as the reference reloads data
    per epoch (train.lua:201). Per-epoch stats reset inside the scan, so
    semantics match n_epochs sequential `make_epoch_fn` calls while host
    synchronization cost is paid once per n_epochs (the production fast
    path on high-latency-attach backends; Trainer wires it via
    --epochsPerCompile, and bench.py uses it for the headline number).

    ``rng`` may be a single key (per-epoch keys derived by
    ``fold_in(rng, i)``) or a stacked (n_epochs,) key array — the
    Trainer passes the exact per-epoch keys its sequential path would
    use, so the two modes produce the same RNG stream.
    """
    epoch = make_epoch_fn(g, d, cfg, num_shards, axis_name, pool_size)

    def multi(state: GanState, rng: jax.Array, pools: jax.Array):
        if jnp.ndim(rng) == 0:
            keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                jnp.arange(n_epochs)
            )
        else:
            keys = rng
        def body(carry, inp):
            k, pool = inp
            st, ms = epoch(carry, k, pool)
            summary = EpochSummary(
                loss_d=jnp.mean(ms.loss_d),
                loss_g=jnp.mean(ms.loss_g),
                acc_d=jnp.mean(ms.acc_d),
                total_valid=metrics.total_valid(st.confusion),
                trained_d=st.trained_d,
                not_trained_d=st.not_trained_d,
                confusion=st.confusion,
            )
            return reset_epoch_stats(st), summary

        state, summaries = lax.scan(body, state, (keys, pools))
        return state, summaries

    return multi


def reset_epoch_stats(state: GanState) -> GanState:
    """Zero confusion + gate counters at epoch end (adversarial.lua:316)."""
    return state._replace(
        confusion=metrics.empty_confusion(),
        trained_d=jnp.int32(0),
        not_trained_d=jnp.int32(0),
    )
