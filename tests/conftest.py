"""Test config: force an 8-device virtual CPU mesh BEFORE jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin force-prepends itself to jax_platforms regardless of the
# env var; override through the config API so tests run on the virtual CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def reference_data() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
