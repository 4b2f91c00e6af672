"""Fused Pallas PCG kernel vs the lax.while_loop reference implementation
(interpret mode on CPU; the same kernel compiles to Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.ops.btd import btd_to_dense
from mpcgpu_tpu.ops.pcg import pcg_solve
from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas


def _make_system(N=64, n=14, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    S = np.zeros((N, 3, n, n), dtype)
    for k in range(N):
        A = rng.standard_normal((n, n)).astype(dtype) * 0.3
        S[k, 1] = A @ A.T + 3 * np.eye(n, dtype=dtype)
        if k > 0:
            S[k, 0] = rng.standard_normal((n, n)).astype(dtype) * 0.1
    for k in range(N - 1):
        S[k, 2] = S[k + 1, 0].T
    D = np.stack([np.linalg.inv(S[k, 1]) for k in range(N)])
    P = np.zeros_like(S)
    for k in range(N):
        P[k, 1] = D[k]
        if k > 0:
            P[k, 0] = -D[k] @ S[k, 0] @ D[k - 1]
        if k < N - 1:
            P[k, 2] = -D[k] @ S[k, 2] @ D[k + 1]
    gamma = rng.standard_normal((N, n)).astype(dtype)
    return map(jnp.asarray, (S, P, gamma, np.zeros((N, n), dtype)))


def test_pallas_pcg_matches_while_loop():
    S, P, gamma, lam0 = _make_system()
    ref = pcg_solve(S, P, gamma, lam0, max_iter=200, exit_tol=1e-10)
    got = pcg_solve_pallas(S, P, gamma, lam0, max_iter=200, exit_tol=1e-10, interpret=True)
    assert bool(got.converged)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam), atol=1e-5)


def test_pallas_pcg_solves_system():
    S, P, gamma, lam0 = _make_system(N=32, n=14, seed=3)
    got = pcg_solve_pallas(S, P, gamma, lam0, max_iter=300, exit_tol=1e-12, interpret=True)
    dense = np.linalg.solve(np.asarray(btd_to_dense(S), np.float64),
                            np.asarray(gamma, np.float64).ravel())
    np.testing.assert_allclose(
        np.asarray(got.lam).ravel(), dense, atol=1e-4
    )


def test_rnorm_exit_criterion():
    """'rnorm' exits on ||r||_2 < tol (reference/GBD-PCG semantics, SURVEY C17)
    and agrees between the while_loop and pallas implementations."""
    S, P, gamma, lam0 = _make_system(N=32, n=14, seed=5)
    tol = 1e-4
    ref = pcg_solve(S, P, gamma, lam0, max_iter=300, exit_tol=tol,
                    exit_criterion="rnorm")
    got = pcg_solve_pallas(S, P, gamma, lam0, max_iter=300, exit_tol=tol,
                           exit_criterion="rnorm", interpret=True)
    assert bool(ref.converged) and bool(got.converged)
    assert int(got.iters) == int(ref.iters)
    # the residual at exit really satisfies the 2-norm test
    r = np.asarray(gamma, np.float64).ravel() - (
        np.asarray(btd_to_dense(S), np.float64)
        @ np.asarray(ref.lam, np.float64).ravel())
    assert np.linalg.norm(r) < tol
    # eta-criterion run at the same tol exits at a DIFFERENT iterate in
    # general (different metric) — just check both solve the system
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-5)


def test_rnorm_exit_criterion_sharded():
    """Knot-sharded PCG honors the rnorm criterion (psum'd r.r)."""
    from jax.sharding import Mesh
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_sharded

    S, P, gamma, lam0 = _make_system(N=32, n=14, seed=7)
    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("knot",))
    tol = 1e-4
    ref = pcg_solve(S, P, gamma, lam0, max_iter=300, exit_tol=tol,
                    exit_criterion="rnorm")
    got = pcg_solve_sharded(S, P, gamma, lam0, mesh, max_iter=300,
                            exit_tol=tol, exit_criterion="rnorm")
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-5)


def test_pcg_dz_fused_epilogue_matches_split_kernels():
    """pcg_dz_solve_pallas_lanes (PCG kernel + dz epilogue, ONE launch) ==
    pcg_solve_pallas_lanes followed by compute_dz_pallas (round 4)."""
    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.ops.pcg_pallas import (pcg_dz_solve_pallas_lanes,
                                           pcg_solve_pallas_lanes)
    from mpcgpu_tpu.solver.kkt_pallas import (build_kkt_schur_pallas,
                                              compute_dz_pallas)
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    N = 16
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.02 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    rho = jnp.asarray(1e-3, dtype)
    lane = build_kkt_schur_pallas(model, cost, xu, xu[0, :14], ee, rho,
                                  1 / 64.0, interpret=True)
    lam0 = jnp.zeros((14, N), dtype)

    ref = pcg_solve_pallas_lanes(lane["S"], lane["Pinv"], lane["gamma"],
                                 lam0, max_iter=60, exit_tol=1e-7,
                                 interpret=True)
    dz_ref = compute_dz_pallas(lane, ref.lam.T, xu[:, 14:], rho,
                               cost.r_cost, interpret=True)

    lam_l, dz, iters, conv = pcg_dz_solve_pallas_lanes(
        lane, lane["gamma"], lam0, xu[:, 14:], rho, cost.r_cost,
        max_iter=60, exit_tol=1e-7, interpret=True)
    np.testing.assert_allclose(np.asarray(lam_l), np.asarray(ref.lam),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(dz_ref), atol=1e-6)
    assert int(iters) == int(ref.iters)
    assert bool(conv) == bool(ref.converged)


def test_sqp_fused_dz_matches_split():
    """sqp_solve(fused=True, fused_dz=True) == fused_dz=False bit-for-bit
    in interpret mode (same math, one fewer kernel launch)."""
    from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.solver.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    N = 16
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.02 * jax.random.normal(jax.random.PRNGKey(1), xu.shape, dtype)
    lam = jnp.zeros((N, 14), dtype)
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=40, exit_tol=1e-6)
    kw = dict(linsys="pcg_pallas", merit_impl="pallas", fused=True)
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xu[0, :14], ee, 1e-3,
                    1 / 64.0, **kw)
    got = sqp_solve(model, cost, scfg, pcfg, xu, lam, xu[0, :14], ee, 1e-3,
                    1 / 64.0, fused_dz=True, **kw)
    np.testing.assert_array_equal(np.asarray(got.xu), np.asarray(ref.xu))
    np.testing.assert_array_equal(np.asarray(got.pcg_iters),
                                  np.asarray(ref.pcg_iters))
