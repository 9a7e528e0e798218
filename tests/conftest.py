"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding is exercised without TPU hardware (the driver dry-runs
the TPU path separately).

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests override
it to cpu both via env and jax.config, before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
