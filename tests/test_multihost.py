"""Multi-host entry tests (facegen/parallel/multihost.py).

The reference is single-process (train.lua:79 `cutorch.setDevice`; no
NCCL/MPI — SURVEY.md §2.3), so this layer is framework-native: every
process calls `jax.distributed.initialize` and the existing mesh
builders span hosts. Validated here two ways:

- unit: env gating, hybrid-mesh layout and the global_put helpers on
  the in-process 8-device virtual mesh;
- integration: a REAL 2-process run (subprocesses on the CPU backend,
  4 virtual devices each) training one data-parallel epoch over the
  8-device global mesh, asserting both processes see the same global
  devices and compute bitwise-identical psum'd losses.
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from facegen.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_maybe_initialize_is_env_gated():
    # empty env -> plain single-process run, no initialize attempt
    assert multihost.maybe_initialize(env={}) is False
    assert not multihost.is_multiprocess()


def test_global_mesh_and_put(devices):
    mesh = multihost.global_mesh()
    assert mesh.shape["data"] == 8
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    rep = multihost.global_put(x, mesh, P())
    shd = multihost.global_put(x, mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(rep), x)
    np.testing.assert_array_equal(np.asarray(shd), x)
    assert len(shd.sharding.device_set) == 8
    tree = multihost.global_put_tree({"a": x, "b": x + 1}, mesh)
    np.testing.assert_array_equal(np.asarray(tree["b"]), x + 1)


def test_shard_pool_global_single_process(devices):
    mesh = multihost.global_mesh()
    pool = np.arange(20 * 2 * 2 * 3, dtype=np.uint8).reshape(20, 2, 2, 3)
    arr = multihost.shard_pool_global(pool, mesh)
    # 20 rows over 8 local shards -> 16 usable
    assert arr.shape[0] == 16
    np.testing.assert_array_equal(np.asarray(arr), pool[:16])


def test_hybrid_mesh_fallback_layout(devices):
    # no slice topology on CPU -> plain reshape fallback; axis names and
    # sizes must still match the ("data", "model") contract
    mesh = multihost.hybrid_mesh(ici_dp=4, ici_mp=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh_dp = multihost.hybrid_mesh()  # -1 = all local devices
    assert mesh_dp.shape["data"] == 8 and mesh_dp.shape["model"] == 1


_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax

    from facegen.parallel import multihost

    assert multihost.maybe_initialize(), "FACEGEN_COORDINATOR not honored"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert multihost.is_multiprocess()

    from facegen.config import TrainConfig
    from facegen.data.pipeline import prepare_pool
    from facegen.data.synthetic import synthetic_faces
    from facegen.models import gan
    from facegen.parallel import make_parallel_epoch, replicate, shard_pool
    from facegen.train.step import init_state

    mesh = multihost.global_mesh()
    assert mesh.shape["data"] == 8
    # establish the gloo clique with a tiny all-reduce BEFORE the
    # minutes-long epoch compile: the clique bootstrap has a fixed ~30 s
    # key-exchange deadline that an unlucky compile skew between the two
    # workers can miss (multihost.warmup_collectives docstring)
    multihost.warmup_collectives(mesh)
    cfg = TrainConfig(batch_size=16, scale=16, n_epoch=64,
                      save="/tmp/facegen_mh", synthetic_data=True)
    g, d, bundle = gan.init_gan(jax.random.key(0), cfg.scale, 3,
                                cfg.noise_dim)
    state = replicate(init_state(cfg, bundle), mesh)
    raw = synthetic_faces(jax.random.key(1), 128)
    pool_np = np.asarray(prepare_pool(raw, jax.random.key(2), cfg.scale, 3))
    pool = shard_pool(pool_np, mesh)
    epoch = make_parallel_epoch(g, d, cfg, mesh)
    state, ms = epoch(state, jax.random.key(3), pool)
    loss_d = float(np.asarray(jax.device_get(ms.loss_d)).mean())
    loss_g = float(np.asarray(jax.device_get(ms.loss_g)).mean())
    print(f"RESULT {loss_d!r} {loss_g!r}", flush=True)

    # Trainer-level chunked driver (--epochsPerCompile) on the same
    # global mesh: the chunk path must build its pool stack via the
    # multi-process-safe global_put, not a raw device_put (which cannot
    # target other hosts' chips).
    import dataclasses
    from facegen.train.loop import Trainer

    cfg2 = dataclasses.replace(cfg, noplot=True, epochs_per_compile=2,
                               n_epoch=32, epochs=2)
    tr = Trainer(cfg2, mesh=mesh, verbose=False)
    stats = tr.train_epochs_chunk(0, 2)
    assert len(stats) == 2, stats
    print(f"CHUNK {stats[-1]['loss_d_mean']!r} {stats[-1]['loss_g_mean']!r}",
          flush=True)

    # GSPMD placement on a multi-process 2-D mesh (no step execution —
    # this pins the gspmd._put callback route; a raw device_put here
    # cannot target the other process's devices)
    from facegen.parallel import shard_pool_2d, shard_state
    from facegen.train.step import init_state

    mesh2 = multihost.hybrid_mesh(ici_dp=2, ici_mp=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    st2 = shard_state(init_state(cfg, bundle), mesh2)
    p2 = shard_pool_2d(pool_np, mesh2)
    assert len(p2.sharding.device_set) == 8, p2.sharding
    n_leaves = len(jax.tree.leaves(st2))
    print(f"GSPMD2D {n_leaves} {p2.shape[0]}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel_epoch():
    """2 real processes x 4 virtual CPU devices = one 8-device global
    mesh; both processes must agree bitwise on the psum'd epoch losses."""
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "JAX_", "XLA_"))
    }
    env_base.update(
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "FACEGEN_COORDINATOR": f"127.0.0.1:{port}",
            "FACEGEN_NUM_PROCESSES": "2",
            "PYTHONPATH": REPO,
        }
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, FACEGEN_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        # generous: the workers compile several epoch-sized programs and
        # share the box with whatever else the suite is running
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    for prefix in ("RESULT ", "CHUNK ", "GSPMD2D "):
        results = [
            line for out in outs for line in out.splitlines()
            if line.startswith(prefix)
        ]
        assert len(results) == 2, (prefix, outs)
        # replicated-out metrics: every process must report the same values
        assert results[0] == results[1], results
        if prefix != "GSPMD2D ":
            loss_d, loss_g = (float(t) for t in results[0].split()[1:])
            assert np.isfinite(loss_d) and np.isfinite(loss_g)
