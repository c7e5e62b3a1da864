import os

# Multi-chip sharding is tested on a virtual 8-device CPU mesh; the real TPU
# is reserved for bench.py.  XLA_FLAGS must be set before backend init; the
# platform override goes through jax.config because the environment
# preimports jax with a remote-TPU plugin registered.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import pyprob_tpu  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_everything():
    # Global determinism fixture (reference: tests/conftest.py:6-8)
    pyprob_tpu.seed(123)
    yield


@pytest.fixture(autouse=True)
def _mmap_guard():
    # XLA:CPU's LLVM JIT leaks mmaps per compiled executable; a long
    # single-process run eventually hits vm.max_map_count (65530) and
    # SEGFAULTS inside backend_compile_and_load.  Shed compiled programs
    # between tests well before the cliff (pyprob_tpu.util docs; the
    # library guards its own jit-cache misses at 45000).
    yield
    pyprob_tpu.util.relieve_compile_pressure(threshold=25000)
