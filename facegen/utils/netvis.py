"""Network-activation visualization.

PNG equivalent of `adversarial.visualizeNetwork` (adversarial.lua:348-406):
feed one batch through the network and dump, per conv/linear layer, a
grid of that layer's output planes for the first example — the
"windows full of blinking dots" become files under
`<save>/viz/netvis/<layer>.png`. Linear outputs below ``min_outputs``
values are skipped, and vectors are reshaped to near-square grids, both
like the reference (adversarial.lua:350, 373-386). Values are mapped
from [-1, 1] to [0, 1] for display (image.display min/max args,
adversarial.lua:393).
"""

from __future__ import annotations

import math
import os
from typing import Dict

import numpy as np

from facegen.nn.core import Ctx, Module, sequential_activations
from facegen.utils import grids


def _near_square(n: int):
    rows = int(math.floor(math.sqrt(n)))
    while n % rows != 0 and rows < n:
        rows += 1
    return (rows, n // rows) if rows < n else None


def visualize_network(
    module: Module,
    params,
    state,
    x,
    out_dir: str,
    key=None,
    min_outputs: int = 150,
) -> Dict[str, str]:
    """Dump activation grids; returns {layer_key: png_path}."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    ctx = Ctx(key if key is not None else jax.random.key(0), False)
    _, acts = sequential_activations(module, params, state, x, ctx)
    written = {}
    for k, a in acts:
        arr = np.asarray(a[0], np.float32)  # first example, like output[1]
        if arr.ndim == 3:  # conv feature map (H, W, C) -> channel grid
            if "conv" not in k and "upconv" not in k:
                continue
            planes = np.transpose(arr, (2, 0, 1))[..., None]
        elif arr.ndim == 1:  # linear output
            if "fc" not in k and "dense" not in k:
                continue
            if arr.size < min_outputs:
                continue
            shape = _near_square(arr.size)
            if shape is None:
                continue
            planes = arr.reshape(1, shape[0], shape[1], 1)
        else:
            continue
        planes = np.clip((planes + 1.0) / 2.0, 0.0, 1.0)  # [-1,1] -> [0,1]
        path = os.path.join(out_dir, f"{k}.png")
        grids.save_grid(path, planes, nrow=32)
        written[k] = path
    return written
