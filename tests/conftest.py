"""Test configuration: force CPU with 8 virtual devices so multi-device
sharding tests run without TPU hardware (the driver separately dry-runs the
multi-chip path)."""

import os

# Force CPU even if the environment points JAX at a TPU (tests are numerics
# tests; the bench runs on the real chip).  Note: in some environments the
# TPU plugin ignores JAX_PLATFORMS, so we also set the config flag directly.
os.environ["JAX_PLATFORMS"] = os.environ.get("FVM_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


# Module-level "slow" marking: the heavy dist/tangent/kinetic suites put
# the full CPU run at ~60+ min; `pytest -m "not slow"` is the tight
# inner loop (~10 min) and the default run still includes everything.
_SLOW_MODULES = {
    "test_structure",
    "test_tangent_models",
    "test_sensitivity",
    "test_comet",
    "test_kinetic",
    "test_mems",
    "test_golden_histories",
    "test_phonon_walls",
    "test_ref_cases",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for it in items:
        mod = getattr(it, "module", None)
        if mod is not None and mod.__name__ in _SLOW_MODULES:
            it.add_marker(_pytest.mark.slow)
