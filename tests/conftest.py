"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the mesh/pjit data-parallel
path is exercised without TPU hardware (SURVEY.md §4(d)).

The dev box presets ``JAX_PLATFORMS=axon`` and pre-imports jax at
interpreter startup, so plain env vars are too late — we go through
``jax.config``.  Set ``SOD_TEST_TPU=1`` to run the suite on real hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("SOD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
