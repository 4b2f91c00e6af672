"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is unit-testable without a pod via
xla_force_host_platform_device_count (SURVEY.md section 4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# oracle tests compare against float64 references; production arrays are
# created explicitly float32, so enabling x64 here does not change them
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full-suite run accumulates ~70 large compiled programs in one process;
    on this single-CPU box the XLA CPU compiler segfaults intermittently
    late in such sessions (observed twice at ~test 68, inside
    backend_compile_and_load; the same tests pass in isolation).  Bounding
    the live-executable population avoids the unstable regime at the cost
    of a few cross-module recompiles."""
    yield
    jax.clear_caches()
