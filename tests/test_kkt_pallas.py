"""Fused Pallas KKT kernel vs the XLA build_kkt reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.solver.kkt import build_kkt
from mpcgpu_tpu.solver.kkt_pallas import build_kkt_pallas
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj


@pytest.fixture(scope="module")
def problem():
    N = 16
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    return model, cost, xu, xu[0, :14], ee


@pytest.mark.parametrize("integrator_type", [0, 1])
def test_matches_xla_build_kkt(problem, integrator_type):
    model, cost, xu, xs, ee = problem
    ref = build_kkt(model, cost, xu, xs, ee, 1 / 64.0, integrator_type)
    out = build_kkt_pallas(model, cost, xu, xs, ee, 1 / 64.0,
                           integrator_type, interpret=True)
    for f in ("Q", "q", "R", "r", "A", "B", "c"):
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(out, f))
        scale = max(float(np.max(np.abs(a))), 1e-12)
        np.testing.assert_allclose(b, a, atol=5e-5 * scale,
                                   err_msg=f"block {f} mismatch")


def test_terminal_eval_quirk(problem):
    """terminal_at_last_state=False must evaluate knot N-1's cost at x_{N-2}
    (the reference's behavior, iiwa_eepos_plant.cuh:399)."""
    import dataclasses

    model, cost, xu, xs, ee = problem
    cost_q = dataclasses.replace(cost, terminal_at_last_state=False)
    ref = build_kkt(model, cost_q, xu, xs, ee, 1 / 64.0)
    out = build_kkt_pallas(model, cost_q, xu, xs, ee, 1 / 64.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("integrator_type", [0, 1])
def test_fused_kkt_schur_matches_xla(problem, integrator_type):
    """build_kkt_schur_pallas == build_kkt + form_schur_system (+ dz kernel),
    for both integrators (the semi-implicit branch has distinct dt^2-coupled
    brbt/bu blocks)."""
    from mpcgpu_tpu.ops.schur import compute_dz, form_schur_system
    from mpcgpu_tpu.solver.kkt_pallas import (
        build_kkt_schur_pallas, compute_dz_pallas)

    model, cost, xu, xs, ee = problem
    rho = 1e-3
    kkt = build_kkt(model, cost, xu, xs, ee, 1 / 64.0, integrator_type)
    schur = form_schur_system(kkt, rho)
    out = build_kkt_schur_pallas(model, cost, xu, xs, ee, rho, 1 / 64.0,
                                 integrator_type, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out["S"]), np.transpose(np.asarray(schur.S), (1, 2, 3, 0)),
        atol=5e-5 * float(np.max(np.abs(schur.S))))
    np.testing.assert_allclose(
        np.asarray(out["Pinv"]), np.transpose(np.asarray(schur.Pinv), (1, 2, 3, 0)),
        atol=5e-5 * float(np.max(np.abs(schur.Pinv))))
    np.testing.assert_allclose(
        np.asarray(out["gamma"]), np.asarray(schur.gamma).T,
        atol=5e-5 * float(np.max(np.abs(schur.gamma))))

    lam = jax.random.normal(jax.random.PRNGKey(1), (xu.shape[0], 14), jnp.float32)
    dz_ref = compute_dz(kkt, schur, lam)
    dz = compute_dz_pallas(out, lam, xu[:, 14:], rho, cost.r_cost,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(dz_ref),
                               atol=5e-5 * float(np.max(np.abs(dz_ref))))


def test_fused_sqp_matches_unfused(problem):
    """Full fused-pipeline SQP == XLA-path SQP on the same problem."""
    from mpcgpu_tpu.config import PCGConfig, SQPConfig
    from mpcgpu_tpu.solver.sqp import sqp_solve

    model, cost, xu, xs, ee = problem
    lam = jnp.zeros((xu.shape[0], 14), jnp.float32)
    a = sqp_solve(model, cost, SQPConfig(max_iter=3),
                  PCGConfig(max_iter=60, exit_tol=1e-6),
                  xu, lam, xs, ee, 1e-3, 1 / 64.0, linsys="pcg")
    b = sqp_solve(model, cost, SQPConfig(max_iter=3),
                  PCGConfig(max_iter=60, exit_tol=1e-6),
                  xu, lam, xs, ee, 1e-3, 1 / 64.0, linsys="pcg_pallas",
                  merit_impl="pallas")
    np.testing.assert_allclose(np.asarray(b.xu), np.asarray(a.xu), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.pcg_iters), np.asarray(b.pcg_iters))


def test_fused_kkt_schur_launder_path_matches_xla():
    """The >128-lane kernel formulation (VMEM-scratch-laundered CRBA +
    Sherman-Morrison Qinv + scalar-row Cholesky theta inverse) against the
    XLA oracle at N=144 — the smallest size that exercises that path."""
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.solver.kkt_pallas import build_kkt_schur_pallas

    N = 144
    model = iiwa14(dtype=jnp.float32)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], jnp.float32)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(3), xu.shape,
                                       jnp.float32)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], jnp.float32)
    xs = xu[0, :14]
    rho = 1e-3
    kkt = build_kkt(model, cost, xu, xs, ee, 1 / 64.0)
    schur = form_schur_system(kkt, rho)
    out = build_kkt_schur_pallas(model, cost, xu, xs, ee, rho, 1 / 64.0,
                                 interpret=True)
    for name, got, ref in [
        ("S", out["S"], jnp.transpose(schur.S, (1, 2, 3, 0))),
        ("Pinv", out["Pinv"], jnp.transpose(schur.Pinv, (1, 2, 3, 0))),
        ("gamma", out["gamma"], schur.gamma.T),
    ]:
        a, b = np.asarray(got), np.asarray(ref)
        scale = max(float(np.abs(b).max()), 1e-12)
        np.testing.assert_allclose(a, b, atol=5e-5 * scale,
                                   err_msg=f"{name} mismatch (launder path)")
