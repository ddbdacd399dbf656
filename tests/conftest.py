"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests exercise real multi-device code paths without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The session presets JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so the env var is already
# latched — override through the config API instead. Tests run on a virtual
# 8-device CPU mesh unless explicitly opted onto hardware.
import jax  # noqa: E402

if not os.environ.get("SSPSLAM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
