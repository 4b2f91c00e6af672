"""Fused Pallas line-search merit kernel vs the vmapped XLA reference.

Runs in Pallas interpret mode on CPU (tests/conftest.py); the TPU path is
exercised by bench.py / the examples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.solver.merit import line_search_merits
from mpcgpu_tpu.solver.merit_pallas import line_search_merits_pallas
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj


@pytest.fixture(scope="module")
def problem():
    N = 32
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    dz = 0.1 * jax.random.normal(jax.random.PRNGKey(1), xu.shape, dtype)
    return model, cost, xu, dz, xu[0, :14], ee


@pytest.mark.parametrize("integrator_type", [0, 1])
def test_matches_xla_line_search(problem, integrator_type):
    model, cost, xu, dz, xs, ee = problem
    mu = jnp.asarray(10.0, jnp.float32)
    ref, a_ref = line_search_merits(
        model, cost, xu, dz, xs, ee, mu, 1 / 64.0,
        include_zero=True, integrator_type=integrator_type,
    )
    out, a_out = line_search_merits_pallas(
        model, cost, xu, dz, xs, ee, mu, 1 / 64.0,
        integrator_type=integrator_type, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_out))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-6)


def test_alpha_zero_is_current_merit(problem):
    """merits[0] must equal the merit of xu itself regardless of dz."""
    model, cost, xu, dz, xs, ee = problem
    mu = jnp.asarray(10.0, jnp.float32)
    m1, _ = line_search_merits_pallas(
        model, cost, xu, dz, xs, ee, mu, 1 / 64.0, interpret=True
    )
    m2, _ = line_search_merits_pallas(
        model, cost, xu, 2.0 * dz, xs, ee, mu, 1 / 64.0, interpret=True
    )
    np.testing.assert_allclose(float(m1[0]), float(m2[0]), rtol=1e-6)
