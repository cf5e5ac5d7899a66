"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host behavior is tested the JAX way (SURVEY.md §4): the same arithmetic
on a `--xla_force_host_platform_device_count=8` CPU mesh must match the
single-device result. Environment must be set before jax is imported.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
# Keep CPU compiles cheap and deterministic in CI.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob is
# honored. Must run before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
