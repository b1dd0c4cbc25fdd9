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

import pathlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of large while-loop solver programs (a cold full run is ~16 min
# on 2 CPUs, almost all of it compile). Warm reruns of an unchanged
# program hit the cache and the suite drops to the actual compute time.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
