"""Device mesh + SPMD data-parallel training.

The reference is strictly single-device (`cutorch.setDevice`,
train.lua:79; SURVEY.md section 2.3: no DP/TP/PP/EP, no NCCL/MPI). Its
TPU-native replacement is this module: a 1-D `jax.sharding.Mesh` over
the slice's chips with `jax.shard_map`-wrapped train/epoch functions.

Sharding layout (the scaling-book recipe for a model this size —
G~2.5M / D~2.9M params, far below per-chip HBM):

- params, optimizer state, gate ring buffer, confusion: REPLICATED
  (PartitionSpec()); gradient psum-mean over the "data" axis rides ICI.
- epoch data pool + per-step batches: SHARDED on axis "data"
  (PartitionSpec('data')) — each chip gathers/augments/trains on its
  shard, so per-step HBM traffic scales down 1/N.
- PRNG: one key per epoch, folded with `lax.axis_index("data")` inside
  the shard so each chip draws independent noise/batches while the
  psum'd update stays bitwise-identical on every chip.

TP/PP/SP/EP are deliberately N/A at this model scale (SURVEY.md
section 2.3); the param pytrees are ordinary dicts, so tensor-sharding
annotations can be added per-leaf later without API changes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facegen.config import TrainConfig
from facegen.nn.core import Module
from facegen.train.step import GanState, make_epoch_fn, make_train_step

DATA_AXIS = "data"


def make_mesh(mesh_shape: Sequence[int] = (-1,), devices=None) -> Mesh:
    """1-D data mesh. mesh_shape (-1,) = all local devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = tuple(mesh_shape)
    if shape == (-1,):
        shape = (n,)
    total = 1
    for s in shape:
        total *= s
    if total > n:
        raise ValueError(f"mesh {shape} needs {total} devices, have {n}")
    import numpy as np

    if len(shape) != 1:
        raise ValueError(
            f"make_mesh builds the 1-D data mesh; got shape {shape} — "
            "use facegen.parallel.make_mesh2d for 'DP,MP' meshes"
        )
    return Mesh(np.asarray(devices[:total]).reshape(shape), (DATA_AXIS,))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated on every mesh device.

    On a multi-process mesh every process holds the full host value
    (identical seeds/checkpoints), so each process materializes only its
    addressable replicas (parallel/multihost.py:global_put_tree)."""
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        from facegen.parallel.multihost import global_put_tree

        return global_put_tree(tree, mesh, P())
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_pool(pool: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard the epoch pool along the batch dim over the data axis.

    Multi-process meshes take the same route as `replicate`: the pool is
    built identically on every process (shared seed), and each process
    uploads only the rows its local chips own."""
    n = mesh.shape[DATA_AXIS]
    usable = (pool.shape[0] // n) * n
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        from facegen.parallel.multihost import global_put

        return global_put(pool[:usable], mesh, P(DATA_AXIS))
    return jax.device_put(pool[:usable], NamedSharding(mesh, P(DATA_AXIS)))


def make_parallel_epoch(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
    pool_size: Optional[int] = None,
):
    """Data-parallel whole-epoch function: (state, rng, pool) ->
    (state, metrics); state replicated, pool sharded on 'data'."""
    n = mesh.shape[DATA_AXIS]
    inner = make_epoch_fn(g, d, cfg, num_shards=n, axis_name=DATA_AXIS,
                          pool_size=pool_size)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def epoch(state: GanState, rng: jax.Array, pool: jax.Array):
        rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))
        return inner(state, rng, pool)

    return jax.jit(epoch)


def make_parallel_multi_epoch(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
    n_epochs: int,
    pool_size: Optional[int] = None,
):
    """Multi-epoch compiled driver under the 1-D data mesh:
    (state, rngs, pools) -> (state, stacked EpochSummary), pools
    (n_epochs, P, H, W, C) sharded on the pool axis, per-epoch keys
    replicated and folded by chip index inside the shard — the
    shard_map analogue of train/step.py:make_multi_epoch_fn."""
    from facegen.train.step import make_multi_epoch_fn

    n = mesh.shape[DATA_AXIS]
    inner = make_multi_epoch_fn(g, d, cfg, n_epochs, num_shards=n,
                                axis_name=DATA_AXIS, pool_size=pool_size)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(None, DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def multi(state: GanState, rngs: jax.Array, pools: jax.Array):
        if jnp.ndim(rngs) == 0:  # scalar key -> per-epoch keys first
            rngs = jax.vmap(
                lambda i: jax.random.fold_in(rngs, i)
            )(jnp.arange(n_epochs))
        rngs = jax.vmap(
            lambda k: jax.random.fold_in(k, lax.axis_index(DATA_AXIS))
        )(rngs)
        return inner(state, rngs, pools)

    return jax.jit(multi)


def make_parallel_segment(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
):
    """Epoch-segment fn ``(state, rng, pool, offsets)`` under the 1-D
    shard_map mesh — the weightsVisFreq batch-cadence path
    (train/loop.py _segmented_epoch): same per-chip semantics as
    `make_parallel_epoch`, scanned over an arbitrary slice of the
    epoch's global step indices."""
    from facegen.train.step import make_segment_fn

    n = mesh.shape[DATA_AXIS]
    inner = make_segment_fn(g, d, cfg, num_shards=n, axis_name=DATA_AXIS)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def segment(state: GanState, rng: jax.Array, pool: jax.Array,
                offsets: jax.Array):
        rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))
        return inner(state, rng, pool, offsets)

    return jax.jit(segment)


def make_parallel_step(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
):
    """Single data-parallel train step (used by the multichip dryrun and
    step-at-a-time drivers)."""
    n = mesh.shape[DATA_AXIS]
    inner = make_train_step(g, d, cfg, num_shards=n, axis_name=DATA_AXIS)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(state: GanState, rng: jax.Array, pool: jax.Array):
        rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))
        return inner(state, rng, pool)

    return jax.jit(step)
