"""On-chip (real TPU) test harness — the counterpart of tests/conftest.py.

tests/ pins the CPU platform so the suite runs hardware-free; the Mosaic
lowering of the Pallas kernels therefore only ever executes in interpret
mode there, and lowering-only bugs (e.g. the C2=72 Mosaic crash fixed in
781f6bb) escape it.  This directory runs on the DEFAULT platform — invoke
on a host with the TPU attached:

    python -m pytest tests_tpu/ -q

Every test skips itself when no TPU is present, so accidentally running
this directory on a CPU host is a no-op, not a failure.
"""

import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.devices()[0].platform == "cpu":
        pytest.skip("tests_tpu/ requires a TPU device", allow_module_level=False)
