"""Functional module core.

A tiny, explicit module system designed for TPU/XLA semantics:

- A ``Module`` is a pair of pure functions:
    ``init(key, in_shape) -> (params, state, out_shape)``
    ``apply(params, state, x, ctx) -> (y, new_state)``
  where ``in_shape``/``out_shape`` are per-example shapes (no batch dim)
  and ``x`` always carries a leading batch dimension.
- ``params`` are trainable pytrees; ``state`` holds non-trained buffers
  (batch-norm running statistics). Both are plain dicts/tuples, so they
  jit/shard/checkpoint transparently.
- Randomness is explicit: ``Ctx`` carries a PRNG key and the train flag.
  Composite modules fold per-child streams out of it, so a single key
  threads the whole network deterministically.

This replaces the reference's torch ``nn.Sequential`` object graph
(reference models.lua:14-416) with data + functions. There is no
mutation, which is what lets one `jax.jit` trace cover a whole epoch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Any
State = Any
Shape = Tuple[int, ...]


class Ctx(NamedTuple):
    """Per-call context threaded through ``apply``.

    rng:   PRNG key for stochastic layers (dropout, noise). May be None
           when ``train`` is False and no layer needs randomness.
    train: True during training (enables dropout/noise, updates BN
           running stats), False for inference/eval — the equivalent of
           the reference's net:training()/net:evaluate() switches
           (nn_utils.lua:207-222).
    """

    rng: Optional[jax.Array]
    train: bool = False

    def fold(self, i: int) -> "Ctx":
        """Child context with an independent PRNG stream."""
        if self.rng is None:
            return self
        return Ctx(jax.random.fold_in(self.rng, i), self.train)


@dataclasses.dataclass(frozen=True)
class Module:
    init: Callable[[jax.Array, Shape], Tuple[Params, State, Shape]]
    apply: Callable[[Params, State, jax.Array, Ctx], Tuple[jax.Array, State]]
    name: str = "module"
    # composite modules expose (key, child) pairs for introspection
    # (activation visualization, adversarial.lua:348-406 equivalent)
    children: Tuple[Tuple[str, "Module"], ...] = ()


def stateless(name: str, init_params: Callable[[jax.Array, Shape], Tuple[Params, Shape]],
              apply_fn: Callable[[Params, jax.Array, Ctx], jax.Array]) -> Module:
    """Build a Module with no running state."""

    def init(key, in_shape):
        params, out_shape = init_params(key, in_shape)
        return params, (), out_shape

    def apply(params, state, x, ctx):
        return apply_fn(params, x, ctx), state

    return Module(init=init, apply=apply, name=name)


def elementwise(name: str, fn: Callable[[jax.Array], jax.Array]) -> Module:
    """Parameter-free elementwise activation."""
    return stateless(name, lambda key, s: ({}, s), lambda p, x, ctx: fn(x))


def sequential(*modules: Module, name: str = "sequential") -> Module:
    """Chain modules; params/state are dicts keyed ``{idx:02d}_{name}``.

    The equivalent of torch ``nn.Sequential`` (reference models.lua:14),
    but pure: the per-layer PRNG streams are folded from one key.
    """
    keys = [f"{i:02d}_{m.name}" for i, m in enumerate(modules)]

    def init(key, in_shape):
        params, state = {}, {}
        shape = in_shape
        for i, (k, m) in enumerate(zip(keys, modules)):
            p, s, shape = m.init(jax.random.fold_in(key, i), shape)
            params[k], state[k] = p, s
        return params, state, shape

    def apply(params, state, x, ctx):
        new_state = {}
        for i, (k, m) in enumerate(zip(keys, modules)):
            x, new_state[k] = m.apply(params[k], state[k], x, ctx.fold(i))
        return x, new_state

    return Module(init=init, apply=apply, name=name,
                  children=tuple(zip(keys, modules)))


def sequential_activations(module: Module, params, state, x, ctx):
    """Run a sequential module capturing every child's output.

    Returns (final_output, [(key, activation), ...]). Used by the
    activation visualizer (the reference's visualizeNetwork,
    adversarial.lua:348-406, shows conv/linear layer outputs live).
    """
    acts = []
    for i, (k, m) in enumerate(module.children):
        x, _ = m.apply(params[k], state[k], x, ctx.fold(i))
        acts.append((k, x))
    return x, acts


def branches(*modules: Module, axis: int = -1, name: str = "branches") -> Module:
    """Feed the same input to every child, concat outputs on ``axis``.

    The torch ``nn.ConcatTable`` + ``nn.JoinTable`` pattern used by the
    multi-branch discriminators (reference models.lua:305-311).
    Children must produce rank-1 per-example outputs when axis=-1.
    """
    keys = [f"{i:02d}_{m.name}" for i, m in enumerate(modules)]

    def init(key, in_shape):
        params, state = {}, {}
        out_shapes = []
        for i, (k, m) in enumerate(zip(keys, modules)):
            p, s, o = m.init(jax.random.fold_in(key, i), in_shape)
            params[k], state[k] = p, s
            out_shapes.append(o)
        # concat along the (per-example) last axis
        base = list(out_shapes[0])
        base[axis] = sum(o[axis] for o in out_shapes)
        return params, state, tuple(base)

    def apply(params, state, x, ctx):
        outs, new_state = [], {}
        for i, (k, m) in enumerate(zip(keys, modules)):
            y, new_state[k] = m.apply(params[k], state[k], x, ctx.fold(i))
            outs.append(y)
        return jnp.concatenate(outs, axis=axis), new_state

    return Module(init=init, apply=apply, name=name)


BIAS_NAMES = frozenset({"b", "bias", "beta"})


def path_key_str(entry) -> str:
    """String name of one pytree path entry (DictKey.key /
    GetAttrKey.name / SequenceKey.idx) — the ONE place this getattr
    chain lives; param classification and checkpoint keys share it."""
    return str(getattr(entry, "key",
                       getattr(entry, "name", getattr(entry, "idx", entry))))


def is_bias_path(path) -> bool:
    """True when a pytree path's leaf is a bias-like parameter
    ('b'/'bias'/'beta' — mirrors torch's .bias keying)."""
    return path_key_str(path[-1]) in BIAS_NAMES


def param_count(params: Params, weights_only: bool = False) -> int:
    """Number of scalars in a parameter pytree.

    ``weights_only=True`` reproduces the reference's accounting, which
    sums only ``.weight`` tensors and ignores biases
    (nn_utils.lua:281-290) — used for printed parity with train.lua:159.
    """
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0
    for path, leaf in leaves:
        if weights_only and is_bias_path(path):
            continue
        total += leaf.size
    return total
