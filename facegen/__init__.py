"""facegen — a TPU-native face-generation GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aleju/face-generator (Lua/Torch7, single-GPU). Everything here is built
TPU-first:

- NHWC tensor layout everywhere (XLA's native conv layout on TPU).
- Pure-functional models: explicit parameter/state pytrees, no globals
  (the reference communicates through Lua globals, train.lua:89-94).
- Whole-epoch `jax.jit`-compiled training with `lax.scan`; GAN control
  flow (the D-accuracy gate, reference adversarial.lua:154-178) is
  carried state + masked updates, never Python branching.
- Data parallelism via `jax.shard_map` over a `jax.sharding.Mesh` with
  `psum` gradient all-reduce over ICI (the reference has no parallelism,
  SURVEY.md section 2.3).
- HBM-resident data: the epoch pool lives on device; no per-step
  host<->device round-trips (the reference crosses on every
  forward/backward through nn.Copy sandwiches, nn_utils.lua:328-395).
"""

__version__ = "0.1.0"


def host_cache_tag() -> str:
    """Fingerprint of this host's CPU feature set, used to namespace the
    persistent compile cache per machine.

    XLA:CPU cache entries are AOT machine code compiled for the feature
    set of the machine that WROTE them; when a cache directory survives a
    machine change (same disk, new host), reloading those entries logs
    "could lead to execution errors such as SIGILL" — and can actually
    deliver that SIGILL (observed: a 2-process integration test whose
    workers died loading another machine's AOT blobs). Keying the cache
    path by CPU flags gives a stale-proof cache instead: a new machine
    silently starts a fresh namespace.
    """
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except Exception:
        flags = platform.processor()
    raw = f"{platform.machine()}:{flags}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache for every facegen entry point.

    The whole-epoch `lax.scan` programs dominate CLI start-up (~90 s of
    compiles per process on the TPU); caching them makes repeat runs —
    resume chains, samplers, benchmarks — start in seconds. Directory
    override / opt-out via FACEGEN_CACHE_DIR (set empty to disable).
    The directory is namespaced per host CPU (`host_cache_tag`) so a
    cache that outlives its machine cannot poison the next one.
    Never raises: an unwritable cache dir just disables caching.
    """
    import os

    path = os.environ.get("FACEGEN_CACHE_DIR")
    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "facegen", "xla"
        )
    if not path:
        return
    try:
        import jax

        path = os.path.join(path, host_cache_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_persistent_compile_cache()

from facegen import config as config  # noqa: F401
