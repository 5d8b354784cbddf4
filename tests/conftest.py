"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the build contract.
Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin registers itself from sitecustomize before conftest runs
# and ignores JAX_PLATFORMS, so select the cpu backend through jax.config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
