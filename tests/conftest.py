"""Test configuration.

Multi-chip sharding tests use a virtual 8-device CPU mesh (the JAX-native
"fake backend" for testing meshes without hardware, SURVEY.md §4): we
raise jax_num_cpu_devices to 8 before any backend initializes and mesh
tests request jax.devices("cpu") explicitly.  Everything else runs on the
default backend (the remote TPU in this environment, CPU elsewhere).
"""

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8
    return devs
