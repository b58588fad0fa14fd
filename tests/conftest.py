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
# The path is namespaced per host CPU (facegen.host_cache_tag): XLA:CPU
# cache entries are AOT machine code, and a cache dir surviving a machine
# change can SIGILL the process that reloads it.
os.environ["FACEGEN_CACHE_DIR"] = _cache_dir

from facegen import host_cache_tag  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_cache_dir, host_cache_tag()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

# Smoke tier (`pytest -m smoke`): one or two quick tests per subsystem,
# the <5-minute-cold gate for iterating; the full suite stays the
# pre-merge bar. Centralized here (rather than decorators spread over
# 19 files) so the tier reads as one list.
_SMOKE = {
    # data layer
    "test_warp_matches_scipy_affine_transform",
    "test_prepare_pool_shapes[32-3]",
    "test_datasource_store_and_holdout",
    # nn layers / kernels
    "test_conv2d_same_padding_matches_numpy",
    "test_subpixel_conv_factor2_reference_view_order",
    "test_fused_matches_composed[4-8-8-3]",
    "test_prelu_shared_slope_fd",
    # models
    "test_g32_parameter_count_matches_reference",
    "test_g_output_shape_and_range[32-3]",
    "test_g_flat_variant",
    "test_g32_forward_matches_torch",
    # training engine
    "test_single_step_updates_both_networks",
    "test_gate_closes_when_accuracy_exceeds_max",
    "test_epoch_scan_runs_and_improves_d",
    "test_multi_epoch_matches_sequential",
    # trainer / tools / checkpointing
    "test_checkpoint_roundtrip",
    "test_trainer_epoch_and_resume",
    "test_sampler_end_to_end",
    "test_restore_gan_zero_flags",
    "test_numpy_generator_matches_jax",
    # c2f family
    "test_make_triples_reconstruction",
    "test_c2f_g_shapes_and_signed_output",
    # parallel / multihost
    "test_parallel_step_runs_and_updates",
    "test_gspmd_sharding_rule_places_big_leaves",
    "test_global_mesh_and_put",
    # native runtime
    "test_gather_rows_matches_numpy",
    # aux / eval
    "test_metrics_logger_roundtrip",
    "test_cli_flag_parity",
    "test_slice_grid_roundtrip_and_order",
    "test_frechet_identical_is_zero_and_shift_is_mu_sq",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SMOKE:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
