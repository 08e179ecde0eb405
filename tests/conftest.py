"""Test configuration.

Tests run on CPU ONLY (jax_platforms pinned before any backend init):

- determinism: TPU f32 convs decompose into bf16 passes with ~1e-3
  noise, which breaks exactness tests; CPU is true f32
- latency: in dev environments the TPU sits behind a ~35 ms relay, so
  per-op tests pay the round trip thousands of times
- isolation: benches/drivers on the real chip never contend with CI

Multi-chip sharding tests use a virtual 8-device CPU mesh (the JAX-native
"fake backend" for testing meshes without hardware, SURVEY.md §4):
jax_num_cpu_devices is raised to 8 before the CPU client initializes.

The compile cache is a CPU-specific directory: /tmp/jax_cache holds TPU
artifacts and possibly foreign-machine CPU AOT code (SIGILL risk).
"""

import os

# CPU test compiles are dominated by XLA backend optimization passes, not
# codegen: the tiny ImageCodec fixture inits in 10.3s at opt level 0 vs
# 47.2s at the default level (measured cold, r3). Tests assert exactness
# between *identically-traced* programs, which level 0 preserves; the
# TPU bench/driver paths never import this conftest and keep full opt.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
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
