"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual XLA devices so that multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4). These env
vars must be set before JAX is imported anywhere in the test process.
"""

import os

# Force-override: the outer environment pins JAX_PLATFORMS to the TPU plugin
# (and the plugin re-asserts "axon,cpu" over the env var at import time),
# which would run tests on hardware with bf16 default matmul precision and
# break float32 parity tolerances. XLA_FLAGS must be in the env before the
# first backend initialization; the platform choice must be applied through
# jax.config, which wins over the plugin's override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The ring/mesh tests run 8-device collectives on however few host cores
# this box has; under load the cross-device rendezvous can exceed XLA:CPU's
# default collective timeout and hard-abort the process ("Fatal Python
# error: Aborted" materializing the result). Raise it — slow is fine,
# aborting the suite is not.
if "xla_cpu_collective_timeout_seconds" not in _flags:
    _flags += " --xla_cpu_collective_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
