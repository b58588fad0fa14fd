"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md section 4
we validate sharding/collectives on `--xla_force_host_platform_device_count=8`
CPU devices. The env must be set before the first JAX backend
initialization (jax may already be imported by the site hook, so we also
flip the config flag, which is read lazily at backend-client creation).
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's cost is dominated by
# compiles of epoch-sized lax.scan programs; caching them across test
# processes/runs cuts repeat wall-clock by an order of magnitude.
_cache_dir = os.environ.get(
    "FACEGEN_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
# facegen/__init__ installs its own persistent cache dir on import; point
# it at the same place so a later `import facegen` can't redirect it.
os.environ["FACEGEN_CACHE_DIR"] = _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
