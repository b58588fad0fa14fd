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


def aggregate_trace(logdir: str, top: int = 25, min_share: float = 0.0):
    """Per-op device-time table from a `trace(logdir)` capture.

    Parses the Chrome trace-event JSON (`*.trace.json.gz`) that
    `jax.profiler.stop_trace` writes under
    `<logdir>/plugins/profile/<ts>/`, keeps the complete events (ph="X")
    on DEVICE tracks (process name containing "TPU"/"GPU"/"device"), and
    aggregates wall duration by op name. This is the TPU-native
    equivalent of a per-kernel nvprof summary — the reference has no
    per-op observability at all (SURVEY.md section 5: wall-clock prints
    only, adversarial.lua:302-305).

    Returns a dict with `total_us`, `device` (the track used) and
    `ops`: a list of {name, total_us, calls, share} sorted by time,
    truncated to `top` rows (share >= min_share).
    """
    import glob
    import gzip

    paths = sorted(
        glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir!r}")
    with gzip.open(paths[-1], "rb") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # pid -> process name, (pid, tid) -> thread name from metadata events
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("name") == "thread_name":
                tid_names[(ev.get("pid"), ev.get("tid"))] = (
                    ev.get("args", {}).get("name", ""))

    def is_device(pid) -> bool:
        name = pid_names.get(pid, "").lower()
        return any(k in name for k in ("tpu", "gpu", "/device:"))

    device_pids = {pid for pid in pid_names if is_device(pid)}
    # The device process exposes hierarchical tracks ("XLA Modules" =
    # one event per executable, "XLA Ops" = one per fused op inside it);
    # summing both would double-count, so the per-op table uses the
    # "XLA Ops" rows and reports the module track separately.
    op_tracks = {k for k, v in tid_names.items()
                 if k[0] in device_pids and v == "XLA Ops"}
    module_tracks = {k for k, v in tid_names.items()
                     if k[0] in device_pids and v == "XLA Modules"}

    def track_ok(ev) -> bool:
        key = (ev.get("pid"), ev.get("tid"))
        if op_tracks:
            return key in op_tracks
        # No "XLA Ops" track (CPU-only traces in tests, or a different
        # profiler format): fall back to the remaining tracks, but still
        # exclude the module/step tracks whose events ENCLOSE the leaf
        # ops — counting both would double every leaf's time.
        if key in module_tracks:
            return False
        if tid_names.get(key, "") in ("Steps", "XLA Modules"):
            return False
        return bool(device_pids) == (ev.get("pid") in device_pids)

    # Control-flow wrappers (the whole-epoch lax.scan shows up as a
    # `while` op) ENCLOSE their body ops on the same track — counting
    # both double-counts every leaf, so wrappers are excluded from the
    # table and the leaves carry the time.
    _WRAPPERS = {"while", "conditional", "call", "control flow"}

    agg: dict = {}
    cats: dict = {}
    total = 0.0
    module_total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) in module_tracks:
            module_total += float(ev.get("dur", 0.0))
        if not track_ok(ev):
            continue
        args = ev.get("args", {})
        cat = args.get("hlo_category", "")
        if cat in _WRAPPERS:
            continue
        dur = float(ev.get("dur", 0.0))
        name = ev.get("name", "?")
        row = agg.setdefault(name, [0.0, 0, cat, 0.0, 0.0])
        row[0] += dur
        row[1] += 1
        row[3] += float(args.get("model_flops", 0) or 0)
        row[4] += float(args.get("bytes_accessed", 0) or 0)
        crow = cats.setdefault(cat or "(uncategorized)", [0.0, 0])
        crow[0] += dur
        crow[1] += 1
        total += dur
    ops = sorted(
        (
            {"name": k, "total_us": v[0], "calls": v[1], "category": v[2],
             "share": (v[0] / total if total else 0.0),
             # achieved rates from XLA's own per-op accounting
             "tflops": (v[3] / (v[0] * 1e-6) / 1e12) if v[0] else 0.0,
             "gbps": (v[4] / (v[0] * 1e-6) / 1e9) if v[0] else 0.0}
            for k, v in agg.items()
        ),
        key=lambda r: -r["total_us"],
    )
    ops = [r for r in ops[:top] if r["share"] >= min_share]
    categories = sorted(
        (
            {"category": k, "total_us": v[0], "calls": v[1],
             "share": (v[0] / total if total else 0.0)}
            for k, v in cats.items()
        ),
        key=lambda r: -r["total_us"],
    )
    device = ", ".join(sorted(pid_names[p] for p in device_pids)) or "host (no device track)"
    return {"total_us": total, "module_total_us": module_total,
            "device": device, "ops": ops, "categories": categories}


def format_op_table(summary: dict) -> str:
    """Render an `aggregate_trace` summary as a markdown table."""
    lines = [
        f"device track(s): {summary['device']};"
        f" leaf-op time {summary['total_us'] / 1e3:.2f} ms"
        f" (module track {summary.get('module_total_us', 0.0) / 1e3:.2f} ms)",
        "",
        "| category | time (us) | calls | share |",
        "|---|---:|---:|---:|",
    ]
    for r in summary.get("categories", []):
        lines.append(
            f"| {r['category']} | {r['total_us']:.0f} | {r['calls']} |"
            f" {100 * r['share']:.1f}% |"
        )
    lines += [
        "",
        "| op | category | time (us) | calls | share | TFLOP/s | GB/s |",
        "|---|---|---:|---:|---:|---:|---:|",
    ]
    for r in summary["ops"]:
        name = r["name"].replace("|", "\\|")
        if len(name) > 48:
            name = name[:45] + "..."
        lines.append(
            f"| `{name}` | {r.get('category', '')} | {r['total_us']:.0f} |"
            f" {r['calls']} | {100 * r['share']:.1f}% |"
            f" {r.get('tflops', 0.0):.1f} | {r.get('gbps', 0.0):.0f} |"
        )
    return "\n".join(lines)


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
