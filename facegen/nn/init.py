"""Weight-initialization schemes.

Two layers of init exist in the reference and we reproduce both:

1. Scheme-based scales (reference weight-init.lua:14-37), applied as
   torch ``reset(stdv)`` — uniform(-stdv, stdv) on weights AND biases,
   then biases zeroed (weight-init.lua:70-72):
     heuristic     sqrt(1/(3*fan_in))          (LeCun "Efficient backprop")
     xavier        sqrt(2/(fan_in+fan_out))
     xavier_caffe  sqrt(1/fan_in)
     kaiming       sqrt(4/(fan_in+fan_out))
   For convs, fan_in = inC*kH*kW and fan_out = outC*kH*kW
   (weight-init.lua:55).

2. The gaussian overwrite: train.lua:137-138 calls
   NN_UTILS.initializeWeights right after model creation, which
   overwrites EVERY top-level module's ``weight`` with N(0, 0.005^2) and
   ``bias`` with N(0, 0.001^2) (nn_utils.lua:8-29). Because G32/D32b are
   flat Sequentials, this hits all layers — including PReLU slopes and
   batch-norm gammas (both are ``.weight`` in torch). That quirky
   effective init (SURVEY.md section 7 quirk b) is what the published
   results trained with, so ``gaussian_overwrite`` reproduces it
   bit-for-bit in distribution.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


def heuristic(fan_in: int, fan_out: int) -> float:
    return math.sqrt(1.0 / (3.0 * fan_in))


def xavier(fan_in: int, fan_out: int) -> float:
    return math.sqrt(2.0 / (fan_in + fan_out))


def xavier_caffe(fan_in: int, fan_out: int) -> float:
    return math.sqrt(1.0 / fan_in)


def kaiming(fan_in: int, fan_out: int) -> float:
    return math.sqrt(4.0 / (fan_in + fan_out))


SCHEMES = {
    "heuristic": heuristic,
    "xavier": xavier,
    "xavier_caffe": xavier_caffe,
    "kaiming": kaiming,
}


def gaussian_overwrite(
    params: Any,
    key: jax.Array,
    w_std: float = 0.005,
    b_std: float = 0.001,
) -> Any:
    """Overwrite every trainable leaf gaussian, like nn_utils.lua:17-29.

    Leaves named 'b'/'bias'/'beta' get N(0, b_std^2); everything else —
    dense/conv weights, PReLU slopes, batch-norm scales — N(0, w_std^2),
    exactly mirroring the torch loop which keys off .weight/.bias.
    """
    from facegen.nn.core import is_bias_path

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves_with_path, treedef = flat
    new_leaves = []
    for i, (path, leaf) in enumerate(leaves_with_path):
        std = b_std if is_bias_path(path) else w_std
        k = jax.random.fold_in(key, i)
        new_leaves.append(std * jax.random.normal(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def zero_biases(params: Any) -> Any:
    """weight-init.lua:70-72: biases zeroed after scheme init."""
    from facegen.nn.core import is_bias_path

    def fix(path, leaf):
        return jnp.zeros_like(leaf) if is_bias_path(path) else leaf

    return jax.tree_util.tree_map_with_path(fix, params)
