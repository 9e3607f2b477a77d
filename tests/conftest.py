"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh/pjit/psum/halo) run without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter startup (with
JAX_PLATFORMS=axon pinned in the env), so env-var overrides are too late —
`jax.config.update` is the reliable switch."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(20260816)
