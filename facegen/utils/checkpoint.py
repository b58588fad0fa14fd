"""Checkpoint save/restore with `.old` rotation.

TPU-native replacement for the reference's torch.save checkpoints
(adversarial.lua:319-329: every saveFreq epochs, rename the previous
file to `.old`, save {D, G, opt, epoch}). Here a checkpoint is a
directory containing:

- `arrays.npz`   — every leaf of the state pytree, keyed by tree path
- `meta.json`    — epoch, config dict, format version

A flat npz + path keys was chosen over pickled objects for the same
reason the reference zeroes activation buffers before saving
(nn_utils.lua:259-279): small, portable, inspectable files — and it
restores into a freshly-built GanState template, so optimizer pytree
layouts can evolve without breaking old checkpoints (keys are matched
by path; strict mode verifies exhaustiveness).

Orbax is intentionally not used for the core format: the state is ~11M
scalars and synchronous npz round-trips in milliseconds, with zero
async-machinery failure modes on exotic backends.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FORMAT_VERSION = 1


def _path_str(path) -> str:
    from facegen.nn.core import path_key_str

    return "/".join(path_key_str(p) for p in path)


def flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        out[_path_str(path)] = np.asarray(leaf)
    return out


def unflatten_like(template: Any, arrays: Dict[str, np.ndarray], strict: bool = True) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = _path_str(path)
        if key not in arrays:
            if strict:
                raise KeyError(f"checkpoint missing leaf {key!r}")
            new_leaves.append(leaf)
            continue
        arr = arrays[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template {np.shape(leaf)}"
            )
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save(
    directory: str,
    name: str,
    state: Any,
    meta: Optional[dict] = None,
    rotate: bool = True,
) -> str:
    """Write checkpoint `<directory>/<name>/`; the previous one is moved
    to `<name>.old` first (adversarial.lua:322-324's mv rotation)."""
    os.makedirs(directory, exist_ok=True)
    target = os.path.join(directory, name)
    tmp = target + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    arrays = flatten_tree(state)
    np.savez(os.path.join(tmp, "arrays.npz"), **arrays)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"version": FORMAT_VERSION, **(meta or {})}, f, indent=1)
    if os.path.exists(target):
        if rotate:
            old = target + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(target, old)
        else:
            shutil.rmtree(target)
    os.rename(tmp, target)
    return target


def load(directory: str, name: str, template: Any, strict: bool = True) -> Tuple[Any, dict]:
    """Restore a checkpoint into the shape of ``template``."""
    target = os.path.join(directory, name)
    with np.load(os.path.join(target, "arrays.npz")) as z:
        arrays = {k: z[k] for k in z.files}
    with open(os.path.join(target, "meta.json")) as f:
        meta = json.load(f)
    return unflatten_like(template, arrays, strict=strict), meta


def exists(directory: str, name: str) -> bool:
    return os.path.exists(os.path.join(directory, name, "arrays.npz"))


def split_network_arg(network: str, default_dir: str = "logs") -> Tuple[str, str]:
    """Normalize a --network argument to (directory, name).

    Accepts 'name', 'dir/name' and reference-style 'dir/name.net'
    (sample.lua:251 loads paths.concat(save, G_base)); a bare name
    resolves under ``default_dir``.
    """
    directory, name = os.path.split(network.rstrip("/"))
    directory = directory or default_dir
    if name.endswith(".net"):
        name = name[: -len(".net")]
    return directory, name


def load_meta(directory: str, name: str) -> dict:
    """Read a checkpoint's meta.json; {} when the checkpoint predates
    metadata or does not exist (callers fall back to explicit flags)."""
    path = os.path.join(directory, name, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def save_orbax(directory: str, name: str, state: Any, meta: Optional[dict] = None) -> str:
    """Alternative backend: orbax PyTreeCheckpointer (for users who want
    orbax's async/multi-host machinery). The npz format above remains
    the default — same tree, different serialization."""
    import orbax.checkpoint as ocp

    target = os.path.abspath(os.path.join(directory, name + ".orbax"))
    if os.path.exists(target):
        old = target + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(target, old)
    ocp.PyTreeCheckpointer().save(target, state)
    with open(os.path.join(target, "facegen_meta.json"), "w") as f:
        json.dump({"version": FORMAT_VERSION, **(meta or {})}, f)
    return target


def load_orbax(directory: str, name: str, template: Any) -> Tuple[Any, dict]:
    import orbax.checkpoint as ocp

    target = os.path.abspath(os.path.join(directory, name + ".orbax"))
    restored = ocp.PyTreeCheckpointer().restore(target, item=template)
    meta = {}
    meta_path = os.path.join(target, "facegen_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def config_meta(cfg) -> dict:
    """Store the run flags inside the checkpoint like the reference's
    `opt = OPT` field (adversarial.lua:328)."""
    d = dataclasses.asdict(cfg)
    d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
    return {"config": d}
