"""Test configuration: force the CPU backend with 8 virtual devices so the
data-parallel / sharded paths are exercised without TPU hardware — the TPU-native
analog of the reference's untestable "multi-node only on real clusters" gap
(SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
