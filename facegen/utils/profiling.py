"""Tracing / profiling / debug-mode utilities (SURVEY.md section 5).

The reference's observability is wall-clock prints (adversarial.lua:302-305)
plus browser plots. TPU-native equivalents here:

- `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace of the steps it wraps.
- `enable_nan_debugging()` — flips `jax_debug_nans` so the first NaN
  produced under jit raises with a de-optimized traceback (the
  structured version of the reference's exitIfNaNs abort,
  train_denoiser.lua:371-379).
- `MetricsLogger` — appends one JSON line per epoch to
  `<save>/metrics.jsonl`; the durable replacement for the `display`
  dashboard curves (train_denoiser.lua:181-197).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


class MetricsLogger:
    def __init__(self, save_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, name)

    def log(self, record: dict) -> None:
        record = {"time": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read_all(self):
        if not os.path.exists(self.path):
            return []

        def parse(line):
            try:
                return json.loads(line) if line.strip() else None
            except json.JSONDecodeError:  # torn concurrent append
                return None

        with open(self.path) as f:
            return [r for r in map(parse, f) if r is not None]
