"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 test strategy).

A pytest plugin imports jax before this file runs, so the platform is switched
via jax.config (valid until first backend use) rather than env vars — the
session presets JAX_PLATFORMS=axon (TPU)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
