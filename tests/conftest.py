"""Test environment: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; JAX's host-platform device count
override is the idiomatic stand-in (SURVEY.md §4) — meshes, shard_map, and
collectives all execute for real across 8 virtual CPU devices.

Must run before jax initializes its backends, hence the env mutation at
import time of this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon"),
# which overrides the env var — force CPU back explicitly.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
