"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize preimports jax with JAX_PLATFORMS=axon (the
real-TPU tunnel), so env vars in this file would be too late for platform
selection — instead we flip the platform through jax.config before any
backend is initialized.  XLA_FLAGS is still read lazily at CPU-client
creation, so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
