"""Multi-host / multi-slice entry points.

The reference is single-process, single-GPU (`cutorch.setDevice`,
train.lua:79; no NCCL/MPI anywhere — SURVEY.md §2.3). These helpers are
the framework's own multi-process story, following the standard JAX
recipe: every process calls `jax.distributed.initialize`, after which
`jax.devices()` is GLOBAL and the existing mesh builders
(parallel/mesh.py, parallel/gspmd.py) transparently span hosts — the
compiled collectives ride ICI within a slice and DCN across slices
(docs/SCALING.md "Multi-host / multi-slice").

Design:

- `maybe_initialize()` is env-gated and a no-op in single-process runs,
  so every CLI can call it unconditionally; nothing changes for the
  single-chip user.
- Mesh layout across slices follows the scaling-book rule: the OUTER
  (slower, DCN) axis gets pure data parallelism, the INNER (ICI) axes
  carry whatever the single-slice run used (`hybrid_mesh`).
- Host->device input: each process feeds its addressable shards only
  (`global_put` / `shard_pool_global`); no process ever materializes
  another host's data.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facegen.parallel.mesh import DATA_AXIS
from facegen.parallel.gspmd import MODEL_AXIS

_initialized = False


def maybe_initialize(env=None) -> bool:
    """Env-gated `jax.distributed.initialize`.

    Reads ``FACEGEN_COORDINATOR`` (host:port), ``FACEGEN_NUM_PROCESSES``
    and ``FACEGEN_PROCESS_ID`` (JAX's own ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` are honored as fallbacks).
    Returns True when running distributed (including when already
    initialized), False for ordinary single-process runs.

    MUST be called before the first touch of `jax.devices()` —
    backend-client creation is what binds the process to its local view.
    """
    global _initialized
    if _initialized:
        return True
    env = os.environ if env is None else env
    coord = env.get("FACEGEN_COORDINATOR") or env.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    nproc = int(env.get("FACEGEN_NUM_PROCESSES",
                        env.get("JAX_NUM_PROCESSES", "1")))
    pid = int(env.get("FACEGEN_PROCESS_ID", env.get("JAX_PROCESS_ID", "0")))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    _initialized = True
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_mesh(mesh_shape: Sequence[int] = (-1,)) -> Mesh:
    """1-D ("data",) mesh over ALL global devices (every process's
    chips). Identical to parallel.make_mesh — jax.devices() is already
    global after initialize — provided for naming clarity at call sites."""
    from facegen.parallel.mesh import make_mesh

    return make_mesh(mesh_shape, devices=jax.devices())


def hybrid_mesh(ici_dp: int = -1, ici_mp: int = 1) -> Mesh:
    """Multi-slice ("data", "model") mesh with DCN on the outer data
    axis: each slice keeps its single-slice (ici_dp x ici_mp) layout and
    slices are pure-data-parallel to each other, so the per-step
    gradient psum decomposes into intra-slice ICI reductions + one
    small DCN all-reduce (the scaling-book multi-slice recipe).

    ici_dp=-1 uses all of a slice's chips divided by ici_mp. On
    non-TPU backends (no slice topology) this degenerates to an
    ordinary (num_processes * ici_dp, ici_mp) mesh.
    """
    devices = jax.devices()
    per_slice = len(jax.local_devices())
    n_slices = max(jax.process_count(), 1)
    if ici_dp == -1:
        ici_dp = per_slice // ici_mp
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_dp, ici_mp), (n_slices, 1), devices=devices,
        )  # (n_slices*ici_dp, ici_mp)
    except Exception:
        # topology info unavailable (CPU dryrun): plain reshape; process
        # order already groups each host's devices together, which IS
        # the DCN-outer layout
        arr = np.asarray(devices[: n_slices * ici_dp * ici_mp]).reshape(
            n_slices * ici_dp, ici_mp
        )
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def warmup_collectives(mesh: Optional[Mesh] = None) -> None:
    """Establish the cross-process collective clique with a trivial
    all-reduce BEFORE the first big program. No-op in single-process runs.

    XLA:CPU's gloo backend (and the coordination-service bootstrap in
    general) creates its communicator clique at the first collective
    EXECUTION, exchanging keys with a fixed ~30 s deadline that
    jax.distributed.initialize does not expose. A peer process still
    COMPILING its first program misses that deadline and the whole run
    dies with "Gloo context initialization failed: DEADLINE_EXCEEDED" —
    real first programs here are whole-epoch `lax.scan`s with
    minutes-long compiles, and compile skew between processes is
    unbounded (cache hits on one host but not another, CPU load, ...).
    This ~1 s program brings every process to the key exchange
    together; the established clique is then reused by the big programs
    over the same devices. Trainers call this automatically when handed
    a multi-process mesh.
    """
    if not is_multiprocess():
        return
    mesh = global_mesh() if mesh is None else mesh
    arr = global_put(
        np.arange(mesh.devices.size, dtype=np.float32),
        mesh, P(mesh.axis_names[0]),
    )
    import jax.numpy as jnp

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    jax.block_until_ready(total)


def global_put(value, mesh: Mesh, spec: P = P()) -> jax.Array:
    """Build a GLOBAL array on a (possibly multi-process) mesh from a
    host value every process holds in full. Each process materializes
    only its addressable shards (`jax.make_array_from_callback`);
    spec=P() replicates, P("data") shards the leading axis."""
    value = np.asarray(value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(value.shape, sharding,
                                        lambda idx: value[idx])


def global_put_tree(tree, mesh: Mesh, spec: P = P()):
    """`global_put` over a pytree (params/optimizer state replication)."""
    return jax.tree.map(lambda x: global_put(x, mesh, spec), tree)


def shard_pool_global(pool_local: np.ndarray, mesh: Mesh) -> jax.Array:
    """Per-process pool rows -> one global array sharded P("data").

    ``pool_local`` is THIS process's portion (same row count on every
    process); the global leading dim is num_processes * local rows. The
    multi-host analogue of parallel.mesh.shard_pool — no host ever sees
    another host's rows (jax.make_array_from_process_local_data).
    """
    n_local = pool_local.shape[0]
    local_shards = sum(1 for d in mesh.devices.flat
                      if d.process_index == jax.process_index())
    usable = (n_local // max(local_shards, 1)) * max(local_shards, 1)
    if usable == 0:
        raise ValueError(
            f"pool has {n_local} rows but this process owns "
            f"{local_shards} mesh shards — need at least one row per shard"
        )
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(pool_local[:usable])
    )
