"""Test harness configuration.

All tests run on CPU with 8 fake XLA devices so multi-device sharding tests
work without TPU hardware (SURVEY.md §5: the flags must be set in-process
BEFORE jax is imported — shell env vars did not take effect in this
environment).  This conftest is imported by pytest before any test module,
which makes it the one reliable place to do that.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8, f"expected 8 fake CPU devices, got {d}"
    return d
