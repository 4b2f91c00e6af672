"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4
point 5): knot-sharded PCG must match single-device PCG; batched instances
must match per-instance solves; GSPMD-sharded solves must compile and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.ops.pcg import pcg_solve
from mpcgpu_tpu.ops.schur import form_schur_system
from mpcgpu_tpu.parallel.batched import make_batched_sqp_solver
from mpcgpu_tpu.parallel.mesh import make_mesh, shard_batched_problem
from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_sharded
from mpcgpu_tpu.solver.kkt import build_kkt
from mpcgpu_tpu.solver.sqp import sqp_solve
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

N = 32
NX = 14
DT = 1.0 / 64.0


def _problem(dtype=jnp.float32, pert=0.01, seed=0):
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + pert * jax.random.normal(jax.random.PRNGKey(seed), xu.shape, dtype)
    return model, cost, xu, xu[0, :NX], ee


def test_sharded_pcg_matches_single_device():
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)

    ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0, max_iter=300, exit_tol=1e-14)

    mesh = make_mesh(n_instance=1, n_knot=8)
    got = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300, exit_tol=1e-14
    )
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam), atol=1e-8)
    # identical iteration trajectory => identical counts
    assert int(got.iters) == int(ref.iters)


def test_batched_solver_matches_loop():
    model, cost, xu0, xs0, ee = _problem()
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    xu = jnp.stack([xu0 + 0.005 * jax.random.normal(k, xu0.shape, jnp.float32) for k in keys])
    xs = xu[:, 0, :NX]
    ee_b = jnp.broadcast_to(ee, (B,) + ee.shape)
    lam = jnp.zeros((B, N, NX), jnp.float32)
    rho = jnp.full((B,), 1e-3, jnp.float32)

    sqp_cfg = SQPConfig(max_iter=2)
    pcg_cfg = PCGConfig(max_iter=100, exit_tol=1e-7)
    batched = make_batched_sqp_solver(model, cost, sqp_cfg, pcg_cfg, DT, donate=False)
    res_b = batched(xu, lam, xs, ee_b, rho)

    for i in range(B):
        res_i = sqp_solve(
            model, cost, sqp_cfg, pcg_cfg, xu[i], lam[i], xs[i], ee_b[i], rho[i], DT
        )
        # float32; vmap may reassociate reductions
        np.testing.assert_allclose(
            np.asarray(res_b.xu[i]), np.asarray(res_i.xu), atol=3e-4
        )
        assert int(res_b.sqp_iters[i]) == int(res_i.sqp_iters)
        np.testing.assert_array_equal(
            np.asarray(res_b.pcg_iters[i]), np.asarray(res_i.pcg_iters)
        )


def test_gspmd_sharded_batched_solve_runs():
    """Full batched solve jitted over an (instance, knot) mesh — XLA GSPMD
    partitions the knot-parallel stages and inserts the collectives."""
    model, cost, xu0, xs0, ee = _problem()
    B = 4
    mesh = make_mesh(n_instance=4, n_knot=2)
    xu = jnp.broadcast_to(xu0, (B,) + xu0.shape)
    xs = xu[:, 0, :NX]
    ee_b = jnp.broadcast_to(ee, (B,) + ee.shape)
    lam = jnp.zeros((B, N, NX), jnp.float32)
    rho = jnp.full((B,), 1e-3, jnp.float32)
    xu, lam, xs, ee_b, rho = shard_batched_problem(mesh, xu, lam, xs, ee_b, rho)

    batched = make_batched_sqp_solver(
        model, cost, SQPConfig(max_iter=2), PCGConfig(max_iter=50, exit_tol=1e-6),
        DT, donate=False,
    )
    res = batched(xu, lam, xs, ee_b, rho)
    out = np.asarray(res.xu)
    assert np.isfinite(out).all()
    # replicated instances must agree
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_sharded_full_sqp_matches_single_device():
    """Knot-sharded FULL SQP iteration (KKT+Schur+PCG+dz+LS, all SPMD with
    halo exchanges) matches the single-device solver."""
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    model, cost, xu, xs, ee = _problem()
    lam = jnp.zeros((N, NX), jnp.float32)
    scfg = SQPConfig(max_iter=3)
    pcfg = PCGConfig(max_iter=80, exit_tol=1e-7)
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3, DT,
                    linsys="pcg")
    mesh = make_mesh(1, 8)
    got = sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3,
                            DT, mesh)
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.pcg_iters),
                                  np.asarray(ref.pcg_iters))
    np.testing.assert_array_equal(np.asarray(got.ls_alpha_idx),
                                  np.asarray(ref.ls_alpha_idx))


@pytest.mark.parametrize("precond", ["jacobi", "none"])
def test_sharded_full_sqp_other_preconditioners(precond):
    """The knot-sharded SQP supports all three preconditioners (round-1
    restriction removed); equality vs the single-device solver."""
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    model, cost, xu, xs, ee = _problem()
    lam = jnp.zeros((N, NX), jnp.float32)
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=60, exit_tol=1e-7, preconditioner=precond)
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3, DT,
                    linsys="pcg")
    mesh = make_mesh(1, 8)
    got = sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3,
                            DT, mesh)
    # 'none' = unpreconditioned CG on a cond ~1e5 system: f32 reduction-
    # order differences (psum vs vdot) amplify chaotically in unconverged
    # iterates, so only a loose envelope is meaningful there
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=2e-5 if precond == "jacobi" else 2e-2)
    np.testing.assert_array_equal(np.asarray(got.pcg_iters),
                                  np.asarray(ref.pcg_iters))
