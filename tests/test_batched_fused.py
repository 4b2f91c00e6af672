"""Batched fused pipeline (instance-packed lanes + Pallas grid) vs the
single-instance reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.ops.schur import compute_dz, form_schur_system
from mpcgpu_tpu.parallel.batched_fused import (
    build_kkt_schur_batched, compute_dz_batched, instances_per_program,
    pack_lanes, pcg_solve_batched_lanes, sqp_solve_batched_fused,
    unpack_lanes)
from mpcgpu_tpu.solver.kkt import build_kkt
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj


@pytest.fixture(scope="module")
def problem():
    B, N = 4, 16
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu0 = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee0 = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    key = jax.random.PRNGKey(0)
    xu_b = xu0[None] + 0.02 * jax.random.normal(key, (B, N, 21), dtype)
    ee_b = jnp.broadcast_to(ee0, (B, N, 6))
    xs_b = xu_b[:, 0, :14]
    lam_b = jnp.zeros((B, N, 14), dtype)
    rho_b = jnp.asarray([1e-3, 2e-3, 1e-3, 5e-3], dtype)
    return model, cost, xu_b, lam_b, xs_b, ee_b, rho_b


def test_pack_unpack_roundtrip():
    x = jnp.arange(4 * 16 * 5).reshape(4, 16, 5).astype(jnp.float32)
    y = pack_lanes(x, 2, 2)
    assert y.shape == (2, 5, 32)
    # instance 1 of group 0 occupies lanes 16..32
    np.testing.assert_array_equal(np.asarray(y[0, :, 16:]),
                                  np.asarray(x[1]).T)
    np.testing.assert_array_equal(np.asarray(unpack_lanes(y, 4, 16)),
                                  np.asarray(x))


def test_batched_kkt_schur_matches_unbatched(problem):
    model, cost, xu_b, lam_b, xs_b, ee_b, rho_b = problem
    B, N = xu_b.shape[:2]
    I = instances_per_program(N, B)
    assert I >= 2                            # the packing path is exercised
    lane = build_kkt_schur_batched(model, cost, xu_b, xs_b, ee_b, rho_b,
                                   1 / 64.0, interpret=True)
    for b in range(B):
        kkt = build_kkt(model, cost, xu_b[b], xs_b[b], ee_b[b], 1 / 64.0)
        schur = form_schur_system(kkt, rho_b[b])
        g, i = divmod(b, I)
        sl = slice(i * N, (i + 1) * N)
        S_ref = np.transpose(np.asarray(schur.S), (1, 2, 3, 0))
        got = np.asarray(lane["S"][g][:, :, :, sl])
        scale = float(np.max(np.abs(S_ref)))
        np.testing.assert_allclose(got, S_ref, atol=5e-5 * scale,
                                   err_msg=f"S mismatch instance {b}")
        P_ref = np.transpose(np.asarray(schur.Pinv), (1, 2, 3, 0))
        np.testing.assert_allclose(
            np.asarray(lane["Pinv"][g][:, :, :, sl]), P_ref,
            atol=5e-5 * float(np.max(np.abs(P_ref))),
            err_msg=f"Pinv mismatch instance {b}")
        np.testing.assert_allclose(
            np.asarray(lane["gamma"][g][:, sl]), np.asarray(schur.gamma).T,
            atol=5e-5 * float(np.max(np.abs(schur.gamma))),
            err_msg=f"gamma mismatch instance {b}")


def test_batched_pcg_matches_single(problem):
    from mpcgpu_tpu.ops.pcg import pcg_solve

    model, cost, xu_b, lam_b, xs_b, ee_b, rho_b = problem
    B, N = xu_b.shape[:2]
    I = instances_per_program(N, B)
    lane = build_kkt_schur_batched(model, cost, xu_b, xs_b, ee_b, rho_b,
                                   1 / 64.0, interpret=True)
    lam_g = pack_lanes(lam_b, B // I, I)
    # tol well above f32 round-off stagnation: near 1e-8 the eta sequence
    # hovers at rounding level and the exit iteration becomes chaotic under
    # any reduction-order change (masked full-lane sums vs vdot)
    lam_out, iters, conv = pcg_solve_batched_lanes(
        lane["S"], lane["Pinv"], lane["gamma"], lam_g, N, I,
        max_iter=120, exit_tol=1e-6, interpret=True)
    lam_out = unpack_lanes(lam_out, B, N)
    for b in range(B):
        kkt = build_kkt(model, cost, xu_b[b], xs_b[b], ee_b[b], 1 / 64.0)
        schur = form_schur_system(kkt, rho_b[b])
        ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam_b[b],
                        max_iter=120, exit_tol=1e-6)
        assert abs(int(iters.reshape(B)[b]) - int(ref.iters)) <= 1, f"instance {b}"
        assert bool(conv.reshape(B)[b]) == bool(ref.converged)
        np.testing.assert_allclose(
            np.asarray(lam_out[b]), np.asarray(ref.lam), atol=5e-4,
            err_msg=f"lam mismatch instance {b}")


def _diag_btd_lanes(diag_vals, n, L, dtype=jnp.float32):
    """Lane-layout block-diagonal BTD: S[1] diagonal, S[0] = S[2] = 0 — SPD
    by construction.  diag_vals is (L,) (same for every row) or (n, L)."""
    S = jnp.zeros((1, 3, n, n, L), dtype)
    d = jnp.broadcast_to(jnp.asarray(diag_vals, dtype), (n, L))
    eye = jnp.eye(n, dtype=dtype)[:, :, None] * d[:, None, :]
    return S.at[0, 1].set(eye)


def test_batched_pcg_zero_rhs_instance_no_nan_leak():
    """A degenerate instance (zero rhs, zero warm start -> exactly-zero
    residual, frozen from iteration 0) must not poison the other instances
    in its lane group through 0/0 NaNs (ADVICE r2, batched_fused.py:248)."""
    n, N, I = 4, 8, 2
    L = I * N
    dtype = jnp.float32
    # distinct diagonal entries -> CG needs several iterations
    diag = 1.0 + 0.1 * jnp.arange(L, dtype=dtype)
    S = _diag_btd_lanes(diag, n, L)
    Pinv = _diag_btd_lanes(jnp.ones((L,), dtype), n, L)
    gamma = jnp.zeros((1, n, L), dtype)
    gamma = gamma.at[0, :, N:].set(1.0)          # instance 1 healthy, 0 zero
    lam0 = jnp.zeros((1, n, L), dtype)
    lam, iters, conv = pcg_solve_batched_lanes(
        S, Pinv, gamma, lam0, N, I, max_iter=60, exit_tol=1e-6,
        interpret=True)
    lam = np.asarray(lam)
    assert np.isfinite(lam).all(), "NaN leaked from the frozen instance"
    # frozen instance: exact zeros, 0 iterations, converged
    np.testing.assert_array_equal(lam[0, :, :N], 0.0)
    assert int(iters[0, 0]) == 0 and bool(conv[0, 0])
    # healthy instance: solves the diagonal system lam = gamma / diag
    expect = 1.0 / np.asarray(diag[N:])
    np.testing.assert_allclose(lam[0, :, N:],
                               np.broadcast_to(expect, (n, N)), atol=1e-3)
    assert bool(conv[0, 1])


def test_batched_pcg_iteration_cap_exact():
    """Non-converged instances stop at EXACTLY max_iter, not max_iter +
    unroll - 1 (ADVICE r2, batched_fused.py:280)."""
    n, N, I = 4, 8, 2
    L = I * N
    dtype = jnp.float32
    # distinct eigenvalue per (row, lane): 32 per instance, so exact CG
    # convergence (and the 0/0 breakdown after it) sits beyond the cap
    diag = 1.0 + 0.05 * jnp.arange(n * L, dtype=dtype).reshape(n, L)
    S = _diag_btd_lanes(diag, n, L)
    Pinv = _diag_btd_lanes(jnp.ones((L,), dtype), n, L)
    gamma = jnp.ones((1, n, L), dtype)
    lam0 = jnp.zeros((1, n, L), dtype)
    # tol=0 can never fire -> every instance runs to the cap
    lam, iters, conv = pcg_solve_batched_lanes(
        S, Pinv, gamma, lam0, N, I, max_iter=21, exit_tol=0.0,
        unroll=4, interpret=True)
    assert np.asarray(iters).tolist() == [[21, 21]]
    assert not np.asarray(conv).any()
    assert np.isfinite(np.asarray(lam)).all()


def test_batched_fused_sqp_matches_vmap(problem):
    from mpcgpu_tpu.solver.sqp import sqp_solve

    model, cost, xu_b, lam_b, xs_b, ee_b, rho_b = problem
    sqp_cfg = SQPConfig(max_iter=3)
    pcg_cfg = PCGConfig(max_iter=60, exit_tol=1e-6)

    got = sqp_solve_batched_fused(
        model, cost, sqp_cfg, pcg_cfg, xu_b, lam_b, xs_b, ee_b, rho_b,
        1 / 64.0, interpret=True)

    ref = jax.vmap(
        lambda xu, lam, xs, ee, rho: sqp_solve(
            model, cost, sqp_cfg, pcg_cfg, xu, lam, xs, ee, rho, 1 / 64.0,
            linsys="pcg")
    )(xu_b, lam_b, xs_b, ee_b, rho_b)

    # PCG iteration counts may differ by 1 (reduction-order, see above)
    assert np.abs(np.asarray(got.pcg_iters) - np.asarray(ref.pcg_iters)).max() <= 1
    np.testing.assert_array_equal(np.asarray(got.ls_alpha_idx),
                                  np.asarray(ref.ls_alpha_idx))
    # Qinv is Sherman-Morrison EXACT in the fused kernel vs a numerical
    # Gauss-Jordan in the XLA path; after 3 SQP iterations + PCG that gives
    # O(1e-3) iterate drift on O(1) joint values
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=1e-5)


def test_batched_fused_sharded_matches_unsharded(problem):
    """Instance-sharded (shard_map over the instance mesh axis) gridded
    fused pipeline == the single-device gridded pipeline, instance for
    instance (VERDICT r3 item 6: batch x device composition)."""
    from mpcgpu_tpu.parallel.batched_fused import (
        sqp_solve_batched_fused_sharded)
    from mpcgpu_tpu.parallel.mesh import make_mesh

    model, cost, xu_b, lam_b, xs_b, ee_b, rho_b = problem
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=40, exit_tol=1e-6)
    # pin the SAME lane packing (I=2) on both sides: each device's gridded
    # program then processes identical instance groups, so results match to
    # rounding (instances never couple); packing variation itself is covered
    # by test_batched_fused_sqp_matches_vmap
    ref = sqp_solve_batched_fused(
        model, cost, scfg, pcfg, xu_b, lam_b, xs_b, ee_b, rho_b, 1 / 64.0,
        inst_per_prog=2)
    mesh = make_mesh(n_instance=2, n_knot=1)
    got = sqp_solve_batched_fused_sharded(
        model, cost, scfg, pcfg, xu_b, lam_b, xs_b, ee_b, rho_b, 1 / 64.0,
        mesh, inst_per_prog=2)
    # per-instance math is identical, but XLA lowers the outer-loop
    # reductions differently for the (local B=2) vs (global B=4) shapes, so
    # agreement is f32-rounding-level, not bitwise (measured: <= 5e-6)
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=1e-4)
    assert np.max(np.abs(np.asarray(got.pcg_iters, np.int64)
                         - np.asarray(ref.pcg_iters, np.int64))) <= 1
    np.testing.assert_array_equal(np.asarray(got.ls_alpha_idx),
                                  np.asarray(ref.ls_alpha_idx))
