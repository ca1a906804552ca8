"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the TPU-native
substitute for a multi-node test cluster).

Note: this environment's sitecustomize registers an "axon" TPU backend and
sets jax_platforms="axon,cpu" at interpreter start, overriding the
JAX_PLATFORMS env var — so we must force the platform through jax.config
(and do it before any backend initializes)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"expected cpu backend, got {devs}"
    return devs


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
