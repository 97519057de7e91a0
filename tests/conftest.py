"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the sharded
path); see SURVEY.md §4 (test strategy) for the tier layout.
"""

import os

# Must be set before jax import. Force CPU: the ambient environment may pin
# JAX_PLATFORMS to a remote TPU platform, which would funnel every test
# through the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def mode_mono():
    import eradiate_tpu

    eradiate_tpu.set_mode("mono")
    yield


@pytest.fixture
def mode_mono_double(mode_mono):
    yield


@pytest.fixture
def mode_ckd():
    import eradiate_tpu

    eradiate_tpu.set_mode("ckd")
    yield


@pytest.fixture
def mode_mono_polarized():
    import eradiate_tpu

    eradiate_tpu.set_mode("mono_polarized")
    yield


@pytest.fixture(autouse=True)
def _default_mode():
    """Ensure a mode is always active (tests may override)."""
    import eradiate_tpu

    eradiate_tpu.set_mode("mono")
    yield


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
