"""Test configuration: force the CPU backend with 8 virtual devices so the
data-parallel / sharded paths are exercised without TPU hardware — the TPU-native
analog of the reference's untestable "multi-node only on real clusters" gap
(SURVEY.md §4)."""

import os

# Force CPU even when the environment preselects a TPU platform. Setting the
# env var is not enough here: the hardware plugin registers itself from
# sitecustomize before conftest runs, so pin the platform through jax.config
# (config beats both env and plugin priority).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    f"tests must run on the virtual CPU mesh, got {jax.devices()}"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
