"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware. Must run before jax is imported
anywhere."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container boots with the axon TPU platform pre-registered and
# JAX_PLATFORMS=axon pinned in the env; env overrides don't stick, but the
# config API does. Tests run on a virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
