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


def test_sharded_pcg_pipelined_matches_single_device():
    """Chronopoulos-Gear single-reduction sharded PCG: same iterates, counts,
    and exit semantics as the single-device solver."""
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)

    ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0, max_iter=300,
                    exit_tol=1e-12)
    mesh = make_mesh(n_instance=1, n_knot=8)
    got = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=1e-12, method="pipelined")
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-7)
    # recurrence-level reassociation can shift the exit by an iteration
    assert abs(int(got.iters) - int(ref.iters)) <= 1


@pytest.mark.parametrize("criterion", ["eta", "rnorm"])
@pytest.mark.parametrize("method", ["pipelined", "pipelined_slab"])
def test_sharded_pcg_pipelined_exit_criteria(criterion, method):
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)
    mesh = make_mesh(n_instance=1, n_knot=8)
    # 1e-8 = well past the framework's operating tolerances (1e-6..1e-3);
    # at 1e-10 the CG-method recurrence residual stagnates ~30 iterations
    # later than the true residual (measured) — a known property of
    # single-reduction CG, irrelevant at operating tolerances where counts
    # match classic exactly
    classic = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=1e-8, method="classic", exit_criterion=criterion)
    piped = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=1e-8, method=method, exit_criterion=criterion)
    assert bool(piped.converged) == bool(classic.converged)
    assert abs(int(piped.iters) - int(classic.iters)) <= 3
    np.testing.assert_allclose(np.asarray(piped.lam), np.asarray(classic.lam),
                               atol=1e-7)


@pytest.mark.parametrize("s_steps,n_knot", [(2, 4), (4, 2)])
def test_sharded_pcg_ca_matches_single_device(s_steps, n_knot):
    """Communication-avoiding s-step CG: iterates match exact CG to
    rounding (f64), iteration counts within one basis width of the
    single-device count (the exit can only differ by recurrence
    reassociation, as for pipelined)."""
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)

    ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0, max_iter=300,
                    exit_tol=1e-12)
    mesh = make_mesh(n_instance=1, n_knot=n_knot)
    got = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=1e-12, method="ca", s_steps=s_steps)
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-7)
    assert abs(int(got.iters) - int(ref.iters)) <= s_steps


@pytest.mark.parametrize("criterion", ["eta", "rnorm"])
def test_sharded_pcg_ca_exit_criteria(criterion):
    """Both exit criteria fire mid-basis with exact-CG-equivalent counts."""
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)
    mesh = make_mesh(n_instance=1, n_knot=2)
    # rnorm in CA comes from the quadratic-form recurrence rr0 - 2 f.e +
    # e.F.e, whose cancellation floor makes the exit land a few iterations
    # LATE (conservative) at tight tolerances — measured drift at 1e-8 is
    # ~17 iterations on this system, ~6 at 1e-6; eta (the reference
    # criterion) is a direct recurrence and stays within the basis width
    tol, slack = (1e-8, 4) if criterion == "eta" else (1e-6, 8)
    classic = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=tol, method="classic", exit_criterion=criterion)
    ca = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=tol, method="ca", s_steps=4, exit_criterion=criterion)
    assert bool(ca.converged) == bool(classic.converged)
    assert abs(int(ca.iters) - int(classic.iters)) <= slack
    np.testing.assert_allclose(np.asarray(ca.lam), np.asarray(classic.lam),
                               atol=1e-7 if criterion == "eta" else 1e-5)


def test_sharded_pcg_ca_narrow_slab_falls_back():
    """Slabs narrower than the 2s+1 halo fall back to pipelined (which
    still converges) rather than tracing an out-of-range halo slice."""
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)
    mesh = make_mesh(n_instance=1, n_knot=8)   # L=4 < 2*4+1
    got = pcg_solve_sharded(
        schur.S, schur.Pinv, schur.gamma, lam0, mesh, max_iter=300,
        exit_tol=1e-10, method="ca", s_steps=4)
    assert bool(got.converged)


def _while_body_collective_counts(jaxpr):
    """Find every while eqn (recursively) and count collectives in its body."""
    counts = []

    def as_jaxpr(v):
        if hasattr(v, "eqns"):
            return v                       # plain Jaxpr (e.g. shard_map's)
        if hasattr(v, "jaxpr"):
            return v.jaxpr                 # ClosedJaxpr
        return None

    def subjaxprs(eqn):
        for v in eqn.params.values():
            j = as_jaxpr(v)
            if j is not None:
                yield j
            elif isinstance(v, (list, tuple)):
                for vv in v:
                    jj = as_jaxpr(vv)
                    if jj is not None:
                        yield jj

    def count(j, c):
        for e in j.eqns:
            if e.primitive.name == "ppermute":
                c["ppermute"] += 1
            elif e.primitive.name.startswith("psum"):
                c["psum"] += 1
            for sub in subjaxprs(e):
                count(sub, c)

    def visit(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "while":
                c = {"ppermute": 0, "psum": 0}
                count(eqn.params["body_jaxpr"].jaxpr, c)
                counts.append(c)
            for sub in subjaxprs(eqn):
                visit(sub)

    visit(jaxpr)
    return counts


def test_sharded_pcg_pipelined_collective_budget():
    """Structural guarantee: the pipelined iteration issues exactly ONE psum
    and ONE bidirectional halo exchange (2 ppermutes); classic issues 2
    psums + 4 ppermutes (VERDICT r2 item 2)."""
    model, cost, xu, xs, ee = _problem()
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float32)
    mesh = make_mesh(n_instance=1, n_knot=8)

    def counts_for(method):
        closed = jax.make_jaxpr(
            lambda S, P, g, l: pcg_solve_sharded(
                S, P, g, l, mesh, max_iter=50, exit_tol=1e-6, method=method)
        )(schur.S, schur.Pinv, schur.gamma, lam0)
        found = _while_body_collective_counts(closed.jaxpr)
        assert found, "no while loop found in jaxpr"
        return found[0]

    piped = counts_for("pipelined")
    assert piped["psum"] == 1, piped
    assert piped["ppermute"] == 2, piped
    # the slab-kernel variant must keep the SAME collective budget: the
    # kernel replaces only the per-shard compute (VERDICT r3 item 2)
    slab = counts_for("pipelined_slab")
    assert slab["psum"] == 1, slab
    assert slab["ppermute"] == 2, slab
    classic = counts_for("classic")
    assert classic["psum"] == 2, classic
    assert classic["ppermute"] == 4, classic


def test_sharded_pcg_ca_collective_budget():
    """The s-step methods issue 2 ppermutes + 1 psum per OUTER step — i.e.
    per s ITERATIONS, an s-fold collective reduction vs pipelined."""
    model, cost, xu, xs, ee = _problem()
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float32)
    mesh = make_mesh(n_instance=1, n_knot=2)

    for method in ("ca", "ca_slab"):
        closed = jax.make_jaxpr(
            lambda S, P, g, l: pcg_solve_sharded(
                S, P, g, l, mesh, max_iter=50, exit_tol=1e-6, method=method,
                s_steps=2)
        )(schur.S, schur.Pinv, schur.gamma, lam0)
        found = _while_body_collective_counts(closed.jaxpr)
        assert found, "no while loop found in jaxpr"
        assert found[0]["psum"] == 1, (method, found)
        assert found[0]["ppermute"] == 2, (method, found)


def test_sharded_pcg_ca_slab_matches_ca():
    """The kernel path (interpret mode on CPU) reproduces the XLA s-step
    path bit-for-bit at the f64 level: same basis chains, same Gram, same
    coefficient math."""
    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)
    mesh = make_mesh(n_instance=1, n_knot=2)
    ca = pcg_solve_sharded(schur.S, schur.Pinv, schur.gamma, lam0, mesh,
                           max_iter=60, exit_tol=0.0, method="ca", s_steps=4)
    cas = pcg_solve_sharded(schur.S, schur.Pinv, schur.gamma, lam0, mesh,
                            max_iter=60, exit_tol=0.0, method="ca_slab",
                            s_steps=4)
    assert int(ca.iters) == int(cas.iters) == 60
    np.testing.assert_allclose(np.asarray(cas.lam), np.asarray(ca.lam),
                               atol=1e-10)


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


def test_sharded_full_sqp_iter_budget():
    """The traced iteration budget (on-device sqpTimecheck equivalent,
    pcg/sqp.cuh:161-169) caps the sharded solve exactly like sqp_solve's."""
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    model, cost, xu, xs, ee = _problem()
    lam = jnp.zeros((N, NX), jnp.float32)
    scfg = SQPConfig(max_iter=3)
    pcfg = PCGConfig(max_iter=60, exit_tol=1e-7)
    mesh = make_mesh(1, 8)
    got = sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3,
                            DT, mesh, iter_budget=jnp.int32(1))
    assert int(got.sqp_iters) == 1
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3, DT,
                    linsys="pcg", iter_budget=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=2e-5)


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


def test_sharded_full_sqp_fused_matches_single_device():
    """FUSED knot-sharded SQP (slab Pallas KKT+Schur kernel with 2-knot
    halos, slab dz kernel, slab merit-partials kernel, pipelined PCG)
    matches the single-device solver — VERDICT r2 item 1: the multi-chip
    path running single-chip kernel economics."""
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    model, cost, xu, xs, ee = _problem()
    lam = jnp.zeros((N, NX), jnp.float32)
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=60, exit_tol=1e-7)
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3, DT,
                    linsys="pcg")
    mesh = make_mesh(1, 4)
    got = sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3,
                            DT, mesh, fused=True)
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.pcg_iters),
                                  np.asarray(ref.pcg_iters))
    np.testing.assert_array_equal(np.asarray(got.ls_alpha_idx),
                                  np.asarray(ref.ls_alpha_idx))


def test_sharded_full_sqp_ca_matches_single_device():
    """FUSED knot-sharded SQP with the s-step CA PCG (one basis-kernel
    launch + 1 psum + 2 ppermutes per pcg_s_steps iterations) reproduces
    the single-device solver to f32 monomial-basis rounding (counts within
    the basis width).  Tolerance: the CA basis reorders the same arithmetic
    (see _pcg_local_ca), so after 2 warm-started SQP iterations the xu
    iterates drift slightly more than the per-iteration slab path — measured
    max |diff| 3.4e-4 / max rel 1.6e-3 on the CPU mesh — hence 1e-3 here vs
    the per-iteration test's 2e-5."""
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    model, cost, xu, xs, ee = _problem()
    lam = jnp.zeros((N, NX), jnp.float32)
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=60, exit_tol=1e-7)
    ref = sqp_solve(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3, DT,
                    linsys="pcg")
    mesh = make_mesh(1, 2)       # L=16 >= 2s+1 at s=4
    got = sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee, 1e-3,
                            DT, mesh, fused=True, pcg_method="ca_slab",
                            pcg_s_steps=4)
    np.testing.assert_allclose(np.asarray(got.xu), np.asarray(ref.xu),
                               atol=1e-3)
    assert abs(int(np.asarray(got.pcg_iters)[0])
               - int(np.asarray(ref.pcg_iters)[0])) <= 4
    np.testing.assert_array_equal(np.asarray(got.ls_alpha_idx),
                                  np.asarray(ref.ls_alpha_idx))


def test_sharded_pcg_pipelined_one_row_slab_falls_back():
    """L == 1 (N == knot-axis size): the pipelined form's 2-row halo packets
    cannot exist; method='pipelined' must fall back to classic instead of
    failing at trace time (ADVICE r3)."""
    rng = np.random.default_rng(3)
    n = 4
    blocks = rng.standard_normal((8, n, n))
    S = np.zeros((8, 3, n, n))
    for k in range(8):
        S[k, 1] = blocks[k] @ blocks[k].T + 5 * np.eye(n)
    off = 0.1 * rng.standard_normal((7, n, n))
    for k in range(7):
        S[k + 1, 0] = off[k]
        S[k, 2] = off[k].T
    Pinv = np.zeros_like(S)
    for k in range(8):
        Pinv[k, 1] = np.linalg.inv(S[k, 1])
    gamma = rng.standard_normal((8, n))
    S, Pinv, gamma = (jnp.asarray(a, jnp.float64) for a in (S, Pinv, gamma))
    lam0 = jnp.zeros((8, n), jnp.float64)

    ref = pcg_solve(S, Pinv, gamma, lam0, max_iter=200, exit_tol=1e-12)
    mesh = make_mesh(n_instance=1, n_knot=8)
    got = pcg_solve_sharded(S, Pinv, gamma, lam0, mesh, max_iter=200,
                            exit_tol=1e-12, method="pipelined")
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-8)


def _closed_loop_sharded(method, criterion, tol, steps=10, sqp_iters=2,
                         cap=80):
    """Tiny closed-loop tracker (bench.py shift logic) on the CPU mesh with
    the knot-sharded solver; returns (tracking_err, pcg_iters (steps, sqp)).

    f64: the question under test is EXIT-CRITERION fidelity (does the
    pipelined recurrence residual leak into rnorm exits?), not f32
    closed-loop chaos — in f32, rounding-level iterate differences amplify
    to ~4% tracking-error divergence over 10 steps even when every solve's
    exit count matches (measured)."""
    from mpcgpu_tpu.models import dynamics
    from mpcgpu_tpu.parallel.sqp_sharded import sqp_solve_sharded

    dtype = jnp.float64
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    ee_full = jnp.asarray(load_eepos_traj("0_0"), dtype)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(1), xu.shape, dtype)
    xs = xu[0, :NX]
    lam = jnp.zeros((N, NX), dtype)
    mesh = make_mesh(n_instance=1, n_knot=8)
    scfg = SQPConfig(max_iter=sqp_iters)
    pcfg = PCGConfig(max_iter=cap, exit_tol=tol, exit_criterion=criterion)

    @jax.jit
    def solve(xu, lam, xs, ee, rho):
        return sqp_solve_sharded(model, cost, scfg, pcfg, xu, lam, xs, ee,
                                 rho, DT, mesh, pcg_method=method)

    err = 0.0
    iters = []
    rho = jnp.asarray(1e-3, dtype)
    for t in range(steps):
        ee = jax.lax.dynamic_slice_in_dim(ee_full, t, N)
        res = solve(xu, lam, xs, ee, rho)
        iters.append(np.asarray(res.pcg_iters))
        xu = jnp.roll(res.xu, -1, axis=0).at[-1].set(res.xu[-1])
        lam = jnp.roll(res.lam, -1, axis=0).at[-1].set(res.lam[-1])
        xs = res.xu[1, :NX]
        rho = res.rho
        ee_now = np.asarray(dynamics.fk_ee(model, xs[:7]))[:3]
        err += float(np.sum(np.abs(ee_now - np.asarray(ee_full[t + 1, :3]))))
    return err, np.stack(iters)


@pytest.mark.parametrize("tol", [1e-5, 1e-6])
def test_pipelined_closed_loop_exit_fidelity_rnorm(tol):
    """VERDICT r3 item 7: the pipelined single-reduction CG's recurrence
    residual must not leak into the rnorm primary criterion at operating
    tolerances IN THE CLOSED LOOP — classic vs pipelined vs pipelined_slab
    must produce (near-)equal tracking error and <= 1 iteration count drift
    per solve."""
    ref_err, ref_iters = _closed_loop_sharded("classic", "rnorm", tol)
    for method in ("pipelined", "pipelined_slab"):
        err, iters = _closed_loop_sharded(method, "rnorm", tol)
        assert iters.shape == ref_iters.shape
        assert np.max(np.abs(iters - ref_iters)) <= 1, (
            method, iters - ref_iters)
        # same iterate path to recurrence-rounding => same tracked trajectory
        assert abs(err - ref_err) <= 1e-3 * max(ref_err, 1.0), (
            method, err, ref_err)


def test_two_slab_emulation_matches_single_device():
    """pcg_solve_two_slab (the single-chip compiled-coverage harness for the
    pipelined_slab boundary exchange, tools/tpu_smoke.py run_pcg_slab2) must
    reproduce the plain PCG: nontrivial (r, w, s) packets, off-slab u rows,
    and corner-block ring-wrap annihilation all exercised."""
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_two_slab

    model, cost, xu, xs, ee = _problem()
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float32)

    ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0, max_iter=60,
                    exit_tol=1e-7)
    got = pcg_solve_two_slab(schur.S, schur.Pinv, schur.gamma, lam0,
                             max_iter=60, exit_tol=1e-7, interpret=True)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=5e-5)


def test_two_slab_emulation_converged_exit():
    """The eta exit must fire identically in the two-slab emulation (the
    summed two-slab dots ARE the global dots)."""
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_two_slab

    model, cost, xu, xs, ee = _problem(dtype=jnp.float64)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros((N, NX), jnp.float64)

    ref = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0, max_iter=300,
                    exit_tol=1e-12)
    got = pcg_solve_two_slab(schur.S, schur.Pinv, schur.gamma, lam0,
                             max_iter=300, exit_tol=1e-12, interpret=True)
    assert bool(got.converged)
    assert abs(int(got.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               atol=1e-7)
