"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 — the TPU answer to "test multi-node without a real cluster":
``xla_force_host_platform_device_count`` gives N XLA CPU devices so sharding,
collectives, and pjit paths are exercised in CI without hardware.

The interpreter may pre-import jax with ``JAX_PLATFORMS`` pointing at real
hardware (e.g. a tunneled TPU), so env vars alone are not enough — pin the
platform through ``jax.config`` too, which works any time before the first
backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8
    return d
