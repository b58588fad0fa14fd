"""Training-progress visualization.

PNG-file equivalent of nn_utils.visualizeProgress's six `display`
browser windows (nn_utils.lua:131-204): per call it writes, under
`<save>/viz/`:

  samples_fixed.png   — G on the run's FIXED noise vectors (train.lua:195)
  samples_denoised.png— the same after the denoiser (when loaded)
  best50.png          — top-50 of 300 randoms by D score
  worst50.png         — bottom-50 (first is worst)
  real100.png         — 100 training images for comparison

The reference's behavioral sanity probes are preserved: one REAL
training image and one synthetic diagonal non-face are planted among
the 300 randoms (nn_utils.lua:182-183); a healthy D surfaces the real
one in best50 and the synthetic one in worst50. `probe_report` returns
their ranks for the epoch log (and for tests).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facegen.utils import grids
from facegen.utils.infer import GanInference, sanity_image


def visualize_progress(
    inf: GanInference,
    bundle: dict,
    fixed_noise: jax.Array,
    train_pool: jax.Array,
    out_dir: str,
    key: jax.Array,
    denoiser=None,
    epoch: Optional[int] = None,
    window: int = 3,
) -> dict:
    """``window`` is the reference's display-window id base (--window,
    train.lua:44): the PNG analogue prefixes filenames with ``w{id}_``
    for non-default ids, so concurrent runs pointed at the same viz dir
    don't overwrite each other — the same isolation the browser window
    ids give. The default id (3) keeps the canonical filenames."""
    os.makedirs(out_dir, exist_ok=True)
    prefix = "" if window == 3 else f"w{window}_"
    path = lambda name: os.path.join(out_dir, prefix + name)
    k_rand, k_sanity = jax.random.split(key)

    fixed = inf.generate(bundle, fixed_noise)
    grids.save_grid(path("samples_fixed.png"), np.asarray(fixed))
    if denoiser is not None:
        den = denoiser(fixed)
        grids.save_grid(path("samples_denoised.png"), np.asarray(den))

    # 300 randoms with planted probes (nn_utils.lua:178-183)
    randoms = inf.generate_n(bundle, k_rand, 300)
    real_probe = train_pool[0].astype(jnp.float32) / 255.0
    synth_probe = sanity_image(randoms.shape[1], randoms.shape[-1], k_sanity)
    randoms = randoms.at[298].set(real_probe)
    randoms = randoms.at[299].set(synth_probe)

    scores = np.asarray(inf.score(bundle, randoms))
    order_desc = np.argsort(-scores)
    best = np.asarray(randoms)[order_desc[:50]]
    worst = np.asarray(randoms)[order_desc[::-1][:50]]
    grids.save_grid(path("best50.png"), best)
    grids.save_grid(path("worst50.png"), worst)

    n_real = min(100, train_pool.shape[0])
    real100 = np.asarray(train_pool[:n_real], np.float32) / 255.0
    grids.save_grid(path("real100.png"), real100)

    # probe ranks (0 = judged most real of the 300)
    rank_of = {int(i): r for r, i in enumerate(order_desc)}
    report = {
        "real_probe_rank": rank_of[298],
        "synth_probe_rank": rank_of[299],
        "real_probe_score": float(scores[298]),
        "synth_probe_score": float(scores[299]),
    }
    if epoch is not None:
        report["epoch"] = epoch
    return report
