"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no fake backend at all (SURVEY.md §4); JAX gives us one for
free via xla_force_host_platform_device_count — multi-chip sharding logic is
tested without TPU hardware.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8
    return devs
