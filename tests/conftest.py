"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a forced-host-platform device mesh
(no TPU hardware needed); the driver separately compile-checks the TPU path.

NOTE on this box: sitecustomize (/root/.axon_site) imports jax at interpreter
startup and pins JAX_PLATFORMS=axon (the TPU tunnel), so setting the env var
here is too late — the reliable override is jax.config.update after import.
XLA_FLAGS still works because backends initialize lazily on first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# MAGESLAM_TEST_PLATFORM=tpu runs the suite against real TPU hardware
# (enables the TPU-gated bit-exactness tests); default is the virtual
# 8-device CPU mesh.
if os.environ.get("MAGESLAM_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the big fused-engine programs dominate suite
# time; cache them across runs (keyed on HLO, safe across code edits)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
