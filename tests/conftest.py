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


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (the heavyweight pre-snapshot gates)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (subprocess CLIs, live-reference whole-chain "
        "gates, inception) — skipped by default, run with --slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
