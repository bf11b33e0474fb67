"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without real TPU hardware.

The axon TPU plugin (sitecustomize) force-sets ``jax_platforms='axon,cpu'``
via jax.config at interpreter start — the JAX_PLATFORMS env var alone does
NOT stick. We must override through jax.config before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
