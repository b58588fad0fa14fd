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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
