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


# Full-suite process isolation: one process accumulating all ~90 compiled
# programs hit intermittent XLA CPU compiler segfaults late in the session
# (round 2, ~test 68, inside backend_compile_and_load; the same tests pass
# in isolation).  Rather than the round-2 workaround (a module-scope
# jax.clear_caches() fixture), the suite now distributes MODULES across
# worker processes (pytest-xdist loadscope, pyproject addopts), bounding
# each process's live-executable population structurally.  Tests within a
# module still share cached compilations.
