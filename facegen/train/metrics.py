"""Training metrics: a jit-friendly 2x2 confusion matrix.

Replaces `optim.ConfusionMatrix(CLASSES)` (train.lua:177,
adversarial.lua:85-117) with pure array updates. Class order matches the
reference's CLASSES = {"0", "1"}: index 0 = generated/fake
(Y_GENERATOR=0), index 1 = real (Y_NOT_GENERATOR=1). Layout:
``confusion[target, predicted]`` int32 counts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def empty_confusion() -> jax.Array:
    return jnp.zeros((2, 2), jnp.int32)


def update_confusion(confusion: jax.Array, logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Accumulate one batch (adversarial.lua:111-117: pred class is
    output > 0.5, i.e. logit > 0)."""
    pred = (logits.reshape(-1) > 0).astype(jnp.int32)
    tgt = targets.reshape(-1).astype(jnp.int32)
    idx = tgt * 2 + pred
    counts = jnp.bincount(idx, length=4).reshape(2, 2).astype(jnp.int32)
    return confusion + counts


def total_valid(confusion: jax.Array) -> jax.Array:
    """Overall accuracy — optim.ConfusionMatrix.totalValid."""
    correct = confusion[0, 0] + confusion[1, 1]
    total = jnp.maximum(confusion.sum(), 1)
    return correct.astype(jnp.float32) / total.astype(jnp.float32)


def format_confusion(confusion) -> str:
    """Pretty-print in the spirit of torch's __tostring__ (per-class
    valid fractions + totalValid), for the epoch log
    (adversarial.lua:313-314)."""
    import numpy as np

    c = np.asarray(confusion)
    lines = ["ConfusionMatrix:"]
    names = ["0 (fake)", "1 (real)"]
    for i in range(2):
        row_total = max(int(c[i].sum()), 1)
        lines.append(
            f"  [{c[i,0]:7d} {c[i,1]:7d}]  {100.0*c[i,i]/row_total:6.3f}%  [class: {names[i]}]"
        )
    tv = (c[0, 0] + c[1, 1]) / max(int(c.sum()), 1)
    lines.append(f"  + average row correct / totalValid: {100.0*tv:.3f}%")
    return "\n".join(lines)
