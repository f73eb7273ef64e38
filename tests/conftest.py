"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (mirrors the driver's dryrun_multichip environment).

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin before conftest runs, so setting JAX_PLATFORMS in os.environ is
too late — we must go through jax.config. XLA_FLAGS is still read lazily at
CPU-backend init, so the virtual-device flag works from here.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
