"""Test configuration: CPU backend with 8 virtual devices (for mesh tests)
and float64 enabled (parity goldens are double precision, matching the
reference's all-double Eigen math).

Note: this environment pre-registers a TPU platform plugin via
sitecustomize and pins JAX_PLATFORMS in the env, so the platform must be
overridden through jax.config *before* backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
