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

# AO_TEST_TPU=1 keeps the real backend so the on-chip tier
# (tests/test_tpu_numerics.py) can run: pytest is CPU-pinned by default.
if os.environ.get("AO_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the tier is dominated by XLA CPU compiles of
# the backbone smoke models; repeat runs (the common case) hit the cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("AO_TEST_CACHE", "/root/.cache/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    if os.environ.get("AO_TEST_TPU") == "1":
        return
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
