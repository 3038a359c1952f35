"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env pins axon (TPU); tests use the virtual mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin imports jax before this conftest, freezing the env-derived
# config defaults — override programmatically (backends are still uninitialized).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
