"""Test harness: force an 8-virtual-device CPU platform.

This is the JAX-native way to exercise pjit/shard_map "multi-chip" code paths
without TPU hardware (SURVEY.md §4 rebuild plan item (c)).

Note: the environment's sitecustomize imports jax at interpreter boot (and
pins JAX_PLATFORMS), so plain env vars in conftest are too late; we override
through jax.config before any backend is initialized instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles hundreds of programs on
# the (possibly single-core) host CPU; caching them across runs turns a
# cold ~40 min suite into minutes on re-runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
