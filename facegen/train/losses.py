"""GAN losses + weight penalties with reference-exact gradient semantics.

The reference trains D/G with `nn.BCECriterion` on sigmoid outputs
(train.lua:148) and adds L1/L2 penalties directly to the flattened
gradient (adversarial.lua:103-109, 218-224). We compute BCE from logits
(numerically stable, bfloat16-safe) and add the penalty terms to the
gradient pytree explicitly — including, behind a flag, the reference's
G-penalty bug where `G_L2` scales BOTH the sign term and the linear term
(adversarial.lua:223) while the reported loss uses `G_L1`/`G_L2`
correctly (adversarial.lua:220-221).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy, equal to BCECriterion(sigmoid(logits)).

    Stable form: max(l,0) - l*t + log1p(exp(-|l|)).
    """
    logits = logits.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def penalty_loss(params: Any, l1: float, l2: float) -> jax.Array:
    """f += L1*||p||_1 + L2*||p||_2^2 / 2 (adversarial.lua:105-106)."""
    if l1 == 0.0 and l2 == 0.0:
        return jnp.float32(0.0)
    leaves = jax.tree_util.tree_leaves(params)
    l1_term = sum(jnp.sum(jnp.abs(p)) for p in leaves)
    l2_term = sum(jnp.sum(p * p) for p in leaves)
    return l1 * l1_term + l2 * l2_term / 2.0


def add_penalty_grads(grads: Any, params: Any, sign_coef: float, linear_coef: float) -> Any:
    """grads += sign_coef*sign(p) + linear_coef*p (adversarial.lua:108).

    For D: sign_coef=D_L1, linear_coef=D_L2. For G with the reference
    bug reproduced: sign_coef=G_L2, linear_coef=G_L2
    (adversarial.lua:223 uses G_L2 for both); with the bug fixed:
    sign_coef=G_L1.
    """
    if sign_coef == 0.0 and linear_coef == 0.0:
        return grads
    return jax.tree.map(
        lambda g, p: g + sign_coef * jnp.sign(p) + linear_coef * p, grads, params
    )


def clamp_grads(grads: Any, clamp: float) -> Any:
    """Clamp every gradient entry to [-clamp, clamp]; 0 disables
    (adversarial.lua:121-123, 226-228)."""
    if clamp == 0.0:
        return grads
    return jax.tree.map(lambda g: jnp.clip(g, -clamp, clamp), grads)


def batch_accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Fraction of correct sign predictions at threshold 0.5 — the
    ConfusionMatrix `totalValid` of one batch (adversarial.lua:126-127).

    With logits, sigmoid(l) > 0.5 <=> l > 0.
    """
    pred = (logits.reshape(-1) > 0).astype(jnp.float32)
    tgt = targets.reshape(-1).astype(jnp.float32)
    return jnp.mean((pred == tgt).astype(jnp.float32))
