"""Optimizers + the "interruptible" gate.

The reference vendors optim's sgd/adagrad/adam with one change: if the
closure returns ``false`` the update is skipped entirely — parameters
AND optimizer state stay untouched (interruptable_optimizers.lua:22-27,
62-67, 116-121). That is the mechanism behind the D-accuracy gate.

Under jit we express the same thing as a `lax.cond`-selected update: the
transformation runs, and both the new params and the new optimizer state
are selected against the old ones by the gate predicate. The optimizer
step count therefore does not advance on a skipped step, exactly like
the Lua version (Adam bias correction stays in sync).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from facegen.config import TrainConfig


def make_optimizer(method: str, cfg: TrainConfig, which: str) -> optax.GradientTransformation:
    """Build the optax transformation for D or G per the reference
    defaults: adam lr 1e-3 beta (0.9, 0.999) eps 1e-8
    (interruptable_optimizers.lua:53-57), adagrad lr 1e-2 (torch optim
    default), sgd lr/momentum from flags (train.lua:23-26)."""
    if which == "D":
        adam_lr, sgd_lr, sgd_mom = cfg.d_adam_lr_effective, cfg.d_sgd_lr, cfg.d_sgd_momentum
    else:
        adam_lr, sgd_lr, sgd_mom = cfg.g_adam_lr_effective, cfg.g_sgd_lr, cfg.g_sgd_momentum

    if method == "adam":
        return optax.adam(adam_lr, b1=0.9, b2=0.999, eps=1e-8)
    if method == "adagrad":
        # torch optim.adagrad: lr 1e-2, accumulator starts at 0, no eps
        # term beyond 1e-10 guard; optax's initial_accumulator 0.0 + tiny
        # eps matches.
        return optax.adagrad(1e-2, initial_accumulator_value=0.0, eps=1e-10)
    if method == "sgd":
        return optax.sgd(sgd_lr, momentum=sgd_mom if sgd_mom > 0 else None)
    raise ValueError(f"unknown optimizer {method!r}")


def gated_update(
    tx: optax.GradientTransformation,
    grads: Any,
    opt_state: Any,
    params: Any,
    do_update: jax.Array,
) -> Tuple[Any, Any]:
    """Apply ``tx`` only when ``do_update`` is True (a traced bool).

    Returns (new_params, new_opt_state); both equal the inputs when the
    gate is closed — the jit-compatible analogue of the interruptible
    optimizers' `false`-return protocol.
    """
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    def select(new, old):
        return jax.tree.map(lambda a, b: jnp.where(do_update, a, b), new, old)

    return select(new_params, params), select(new_opt_state, opt_state)
