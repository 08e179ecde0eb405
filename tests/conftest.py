"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the JAX-native "fake backend": multi-chip sharding is validated
without TPU hardware via --xla_force_host_platform_device_count (the
strategy SURVEY.md §4 prescribes for the rebuild's test pyramid).
Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
