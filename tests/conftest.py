"""Test configuration: force CPU backend with a simulated 8-device mesh.

SURVEY.md §4.2.4: multi-chip sharding is tested without a cluster via
``xla_force_host_platform_device_count`` — the standard JAX trick.  These env
vars must be set before jax is imported anywhere in the test process."""

import os

# Force CPU even when the environment presets a TPU platform.  Note the
# container's sitecustomize registers the tunneled-TPU PJRT plugin and sets
# ``jax.config.jax_platforms = "axon,cpu"`` directly, so the env var alone is
# not enough — we must update the jax config before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
