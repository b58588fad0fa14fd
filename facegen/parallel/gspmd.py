"""2-D mesh (data x model) training via GSPMD sharding annotations.

The second of the framework's two parallelism modes (SURVEY.md section
2.3 — the reference itself is strictly single-device, train.lua:79):

- `mesh.py` (1-D "data"): explicit SPMD with `jax.shard_map` — per-chip
  local batches, psum-mean gradients, pmean'd BN stats. Local-batch
  semantics, lowest communication.
- this module (2-D "data" x "model"): the pjit/GSPMD recipe — annotate
  the shardings of params/opt-state/data over a `jax.sharding.Mesh` and
  let XLA propagate them and insert the collectives (all-gather /
  reduce-scatter / psum over ICI). The compiled program has EXACT
  single-device global-batch semantics: same RNG stream, same global
  batch-norm statistics, same updates — scaling out changes where the
  FLOPs run, not the math.

Sharding rule (by leaf shape, applied to params AND their optimizer
moments):

- dense kernels (fan_in, fan_out): column-parallel P(None, "model")
  when fan_out divides; else row-parallel P("model", None) when fan_in
  divides (XLA inserts the psum for the contracted dim); else
  replicated. D32b's 2048x512 / 512x512 stacks and G's noise->128*s*s
  projection are the leaves this targets.
- conv kernels (K, K, Cin, Cout): output-channel parallel
  P(None, None, None, "model") when Cout divides — G's 5x5 pyramid
  convs (128->256, 256->128) and D's 3x3 stacks.
- everything else (biases, PReLU slopes, BN affine/stats, gate ring,
  scalars): replicated.

At this model scale (G 2.5M + D 2.9M params) model sharding is about
capability, not need — the layout exists so the same factory scales to
model sizes where it is needed, and it is exercised by the multichip
dryrun and the virtual-mesh test suite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facegen.config import TrainConfig
from facegen.nn.core import Module
from facegen.train.step import GanState, make_epoch_fn, make_train_step

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh2d(dp: int, mp: int, devices=None) -> Mesh:
    """(dp x mp) mesh with axes ("data", "model")."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if dp < 1 or mp < 1:
        raise ValueError(f"mesh axes must be positive, got ({dp}, {mp})")
    if dp * mp > len(devices):
        raise ValueError(
            f"mesh ({dp}, {mp}) needs {dp * mp} devices, have {len(devices)}"
        )
    return Mesh(
        np.asarray(devices[: dp * mp]).reshape(dp, mp),
        (DATA_AXIS, MODEL_AXIS),
    )


def ensure_mesh2d(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Lift a 1-D ("data",) mesh to (N, 1) axes ("data", "model") so
    GSPMD-only trainers accept either mesh flavor; 2-D meshes pass
    through."""
    if mesh is None or MODEL_AXIS in mesh.axis_names:
        return mesh
    devices = list(mesh.devices.flat)
    return make_mesh2d(len(devices), 1, devices=devices)


def mesh2d_from_shape(shape: Sequence[int]) -> Optional[Mesh]:
    """Resolve a --meshShape tuple ('DP' or 'DP,MP'; -1 = all devices)
    into a 2-D GSPMD mesh, or None when only one device is available."""
    n = len(jax.devices())
    if n <= 1:
        return None
    shape = tuple(shape)
    mp = shape[1] if len(shape) == 2 else 1
    dp = n // mp if shape[0] == -1 else shape[0]
    return make_mesh2d(dp, mp)


def _leaf_spec(leaf, mp: int, min_shard: int = 64) -> P:
    """Shape-based sharding rule; also matches optimizer moments, which
    mirror the parameter shapes."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 2:
        if shape[1] % mp == 0 and shape[1] >= min_shard:
            return P(None, MODEL_AXIS)
        if shape[0] % mp == 0 and shape[0] >= min_shard:
            return P(MODEL_AXIS, None)
    elif len(shape) == 4:
        if shape[3] % mp == 0 and shape[3] >= min_shard:
            return P(None, None, None, MODEL_AXIS)
    return P()


def state_shardings(state: GanState, mesh: Mesh, min_shard: int = 64):
    """NamedSharding pytree for a GanState under the 2-D mesh."""
    mp = mesh.shape[MODEL_AXIS]

    def spec_of(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, mp, min_shard))

    return jax.tree.map(spec_of, state)


def _put(x, sharding: NamedSharding):
    """device_put that also works on multi-process meshes.

    `jax.device_put` cannot target another host's chips; when the mesh
    spans processes, build the global array from this process's
    addressable shards instead (every process holds the full host value
    — shared seeds/checkpoints — the same contract as
    multihost.global_put)."""
    mesh = sharding.mesh
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        import numpy as np

        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def shard_state(state: GanState, mesh: Mesh, min_shard: int = 64) -> GanState:
    """Place a GanState on the mesh per the sharding rule."""
    return jax.tree.map(
        _put,
        state,
        state_shardings(state, mesh, min_shard),
    )


def _wrap_pad(x, multiple: int):
    """Pad x's leading dim up to the next multiple by repeating its
    first rows (handles x smaller than the multiple)."""
    total = x.shape[0] + (-x.shape[0] % multiple)
    if total == x.shape[0]:
        return x
    reps = -(-total // x.shape[0])
    return jnp.concatenate([x] * reps, axis=0)[:total]


def shard_pool_2d(pool, mesh: Mesh):
    """Shard an epoch pool's batch dim over "data" (replicated over
    "model"). Accepts a single array or a pytree of batched arrays
    (e.g. `C2FPool`): every array leaf is sharded on its leading dim.

    `device_put` requires the sharded dim to divide evenly, so a
    non-divisible pool is wrap-padded (repeating its first rows) up to
    the next multiple — no data is dropped. The GAN/c2f epoch factories
    pass the TRUE pool size as the batch-draw range (`draw_n`), so
    padded rows are never sampled and the math stays exactly the
    single-device program's."""
    n = mesh.shape[DATA_AXIS]
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: _put(_wrap_pad(x, n), sh), pool)


def _noise_sharding(mesh: Mesh) -> NamedSharding:
    """Constraint for internally generated noise batches: shard the
    batch axis over "data". Besides being the right layout, this works
    around a partitioner miscompilation (jax 0.9, GSPMD and Shardy):
    with the noise left replicated on a mesh where BOTH axes are
    non-trivial, conv weight gradients downstream come out scaled by
    exactly dp (minimal repro in tests/test_parallel.py docstrings;
    dense/matmul gradients unaffected, single-axis meshes unaffected)."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def gspmd_jit(fn, mesh: Mesh, n_state_args: int = 1, min_shard: int = 64,
              pool_arg: int = -1):
    """jit an epoch-like fn `(*state_pytrees, ..., pool, ...) ->
    (*state_pytrees, aux)` with GSPMD in/out shardings over `mesh`:
    the first `n_state_args` arguments (params/optimizer/state pytrees)
    are sharded by the shape rule, the `pool_arg`-th argument (the
    epoch pool, default: last) batch-sharded on "data", every other
    argument (rng keys, step offsets) and the trailing aux output
    replicated. The one shared recipe behind every GSPMD factory here
    and the AE/denoiser loops.

    Shardings need concrete leaf shapes, so the jit is built lazily
    from the first call's arguments — which also means callers may pass
    host-resident state (e.g. right after a checkpoint restore) and it
    is placed correctly."""
    repl = NamedSharding(mesh, P())
    pool_sh = NamedSharding(mesh, P(DATA_AXIS))
    cache = {}

    def wrapped(*args):
        if "fn" not in cache:
            pool_i = pool_arg % len(args)
            sh = tuple(state_shardings(a, mesh, min_shard)
                       for a in args[:n_state_args])
            rest = tuple(
                pool_sh if i == pool_i else repl
                for i in range(n_state_args, len(args))
            )
            cache["fn"] = jax.jit(
                fn,
                in_shardings=sh + rest,
                out_shardings=sh + (repl,),
            )
        return cache["fn"](*args)

    return wrapped


def gspmd_infer_jit(fn, mesh: Mesh, n_state_args: int, min_shard: int = 64):
    """jit an inference fn `(*param_pytrees, batch) -> batched output`
    with params sharded by the shape rule and the batch (plus the
    output) sharded on "data" — data-parallel serving. A batch whose
    leading dim does not divide the data axis is wrap-padded for the
    call and the output sliced back, so any request size works."""
    data = NamedSharding(mesh, P(DATA_AXIS))
    dp = mesh.shape[DATA_AXIS]
    cache = {}

    def wrapped(*args):
        if "fn" not in cache:
            sh = tuple(state_shardings(a, mesh, min_shard)
                       for a in args[:n_state_args])
            cache["fn"] = jax.jit(fn, in_shardings=sh + (data,),
                                  out_shardings=data)
        batch = args[-1]
        n = batch.shape[0]
        padded = _wrap_pad(batch, dp)
        if padded.shape[0] != n:
            # the concat result is committed to its producing sharding;
            # place it explicitly so it matches in_shardings
            padded = jax.device_put(padded, data)
            return cache["fn"](*args[:-1], padded)[:n]
        return cache["fn"](*args[:-1], batch)

    return wrapped


def make_gspmd_epoch(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
    pool_size: Optional[int] = None,
):
    """jit the single-device whole-epoch program with in/out shardings
    over the 2-D mesh; GSPMD inserts all collectives. Numerically the
    SAME program as the single-chip `make_epoch_fn` (global batch,
    global BN stats, one RNG stream); `pool_size` (the true pool size)
    doubles as the batch-draw range so wrap-padded pools
    (`shard_pool_2d`) never sample a padded row."""
    epoch = make_epoch_fn(g, d, cfg, pool_size=pool_size,
                          noise_sharding=_noise_sharding(mesh),
                          draw_n=pool_size)
    return gspmd_jit(epoch, mesh)


def make_gspmd_c2f_epoch(
    g: Module,
    d: Module,
    cfg,
    mesh: Mesh,
    pool_size: Optional[int] = None,
):
    """c2f refinement-GAN whole-epoch program under the 2-D mesh — same
    recipe as `make_gspmd_epoch`: the single-device epoch
    (facegen/train/c2f.py) jitted with in/out shardings, image-shaped
    noise constrained onto the data axis (see `_noise_sharding`).
    State is a C2FState, pools are C2FPool pytrees (both fields
    batch-sharded on "data")."""
    from facegen.train.c2f import make_epoch_fn as make_c2f_epoch_fn

    epoch = make_c2f_epoch_fn(g, d, cfg, pool_size=pool_size,
                              noise_sharding=_noise_sharding(mesh),
                              draw_n=pool_size)
    return gspmd_jit(epoch, mesh)


def make_gspmd_segment(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
    draw_n: Optional[int] = None,
):
    """Epoch-segment fn `(state, rng, pool, offsets)` under the 2-D
    mesh — the weightsVisFreq batch-cadence path (train/loop.py
    _segmented_epoch) with the same shardings as `make_gspmd_epoch`."""
    from facegen.train.step import make_segment_fn

    seg = make_segment_fn(g, d, cfg, noise_sharding=_noise_sharding(mesh),
                          draw_n=draw_n)
    return gspmd_jit(seg, mesh, pool_arg=2)


def make_gspmd_step(
    g: Module,
    d: Module,
    cfg: TrainConfig,
    mesh: Mesh,
    draw_n: Optional[int] = None,
):
    """Single train step under the 2-D mesh (the multichip dryrun's
    tensor-parallel validation path). Pass the true pool size as
    `draw_n` when the pool was wrap-padded by `shard_pool_2d`."""
    step = make_train_step(g, d, cfg, noise_sharding=_noise_sharding(mesh),
                           draw_n=draw_n)
    return gspmd_jit(step, mesh)
