"""Test harness: force an 8-device virtual CPU mesh.

The environment pins ``JAX_PLATFORMS=axon`` (real TPU tunnel) via a
sitecustomize hook, so the usual env-var override is ignored; we must switch
platforms in-process before any jax usage. Eight host-platform devices give
us a fake DP slice for pjit/sharding tests (SURVEY.md §4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    # Fail fast if the platform switch did not take (e.g. jax imported first).
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh; got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8
