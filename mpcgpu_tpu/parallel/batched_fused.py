"""Batch-aware fused kernel pipeline: the instance grid the kernels lacked.

Round 1 ran 256-instance batches through vmap of the UNFUSED pipeline
(parallel/batched.py) because chaining the fused kernels under vmap pins
their inter-kernel buffers in scoped VMEM and overflows the 16 MB budget
(solver/sqp.py's `fused` note).  This module gives the fused pipeline a real
instance axis instead, generalizing the reference's per-knot CUDA grid
(kkt.cuh:61) to (instance, knot):

  * instances are PACKED ALONG THE LANE DIMENSION, I = max(1, 128 // N) per
    Pallas program, so small horizons fill the 128-lane vregs that a single
    instance would leave 1 - N/128 empty;
  * a Pallas ``grid=(G,)`` with G = B / I iterates instance groups; every
    program is the SAME single-instance kernel machinery with boundary masks
    keyed on k_local = lane %% N (solver/kkt_pallas.py::_make_kkt_schur_kernel),
    and gridded outputs live in HBM between kernels — no scoped-VMEM pinning;
  * the packed PCG kernel runs per-instance CG recurrences in one program:
    segmented (masked) reductions give each instance its own alpha/beta/
    convergence test, and converged instances freeze exactly as in
    ops/pcg.py's vmap semantics.

The SQP outer loop itself stays in XLA over (B,)-shaped per-instance state
(rho, line-search choice, L-M updates) — cheap elementwise work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.pcg_pallas import _matvec_lanes
from mpcgpu_tpu.precision import highest_precision
from mpcgpu_tpu.solver.sqp import SQPResult


def instances_per_program(N: int, B: int, max_lanes: int = 512) -> int:
    """Instances packed per Pallas program: fill at least the 128-lane vreg,
    go wider (up to max_lanes) only when it divides the batch."""
    target = max(1, 128 // N)
    while target > 1 and B % target:
        target //= 2
    return target


def pack_lanes(x, G: int, I: int):
    """(B, N, c...) -> (G, c..., I*N) with instance i of group g occupying
    lanes [i*N, (i+1)*N)."""
    B, N = x.shape[:2]
    rest = x.shape[2:]
    y = x.reshape((G, I, N) + rest)
    # (G, I, N, c...) -> (G, c..., I, N) -> (G, c..., I*N)
    perm = (0,) + tuple(range(3, 3 + len(rest))) + (1, 2)
    y = jnp.transpose(y, perm)
    return y.reshape((G,) + rest + (I * N,))


def unpack_lanes(y, B: int, N: int):
    """(G, c..., I*N) -> (B, N, c...)."""
    G = y.shape[0]
    rest = y.shape[1:-1]
    I = B // G
    nr = len(rest)
    z = y.reshape((G,) + rest + (I, N))     # (G, c..., I, N)
    z = jnp.moveaxis(z, 1 + nr, 1)          # (G, I, c..., N)
    z = jnp.moveaxis(z, -1, 2)              # (G, I, N, c...)
    return z.reshape((B, N) + rest)


# ---------------------------------------------------------------------------
# gridded KKT + Schur
# ---------------------------------------------------------------------------


@highest_precision
@partial(jax.jit, static_argnames=("cost", "integrator_type", "interpret",
                                   "angle_wrap", "inst_per_prog"))
def build_kkt_schur_batched(
    model: RobotModel, cost: CostConfig, xu_b, xs_b, ee_b, rho_b, dt,
    integrator_type: int = 0, interpret: bool = False,
    angle_wrap: bool = False, inst_per_prog: int | None = None,
):
    """Batched fused KKT+Schur: xu_b (B, N, nx+nu) -> lane dict of (G, ...).

    Output layout matches solver/kkt_pallas.py::build_kkt_schur_pallas with a
    leading group axis: S/Pinv (G, 3, nx, nx, L), gamma/q (G, nx, L), ...
    """
    from mpcgpu_tpu.solver.kkt_pallas import _make_kkt_schur_kernel

    if cost.mode != "ee":
        raise ValueError("fused batched pipeline supports ee cost mode only")
    nq = model.nq
    nx = 2 * nq
    B, N, w = xu_b.shape
    dtype = xu_b.dtype
    I = instances_per_program(N, B) if inst_per_prog is None else inst_per_prog
    if B % I:
        raise ValueError(f"B={B} not divisible by instances/program {I}")
    G = B // I
    L = I * N

    x_b = xu_b[:, :, :nx]
    x_eval = (x_b if cost.terminal_at_last_state
              else x_b.at[:, N - 1].set(x_b[:, N - 2]))

    xu_l = pack_lanes(xu_b, G, I)                        # (G, w, L)
    xeval_l = pack_lanes(x_eval, G, I)                   # (G, nx, L)
    goal_l = pack_lanes(ee_b[:, :, :3], G, I)            # (G, 3, L)
    rho_l = jnp.broadcast_to(
        rho_b.reshape(G, I, 1), (G, I, N)).reshape(G, 1, L)
    dt_arr = jnp.asarray([dt], dtype)

    kernel = _make_kkt_schur_kernel(
        nq, L, integrator_type, float(model.gravity), float(cost.qd_cost),
        float(cost.r_cost), angle_wrap, knots=N)

    grid_in = [
        pl.BlockSpec((1, w, L), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, nx, L), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, 3, L), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, 1, L), lambda g: (g, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7   # model constants, shared
    grid_out = (
        pl.BlockSpec((1, 3, nx, nx, L), lambda g: (g, 0, 0, 0, 0)),
        pl.BlockSpec((1, 3, nx, nx, L), lambda g: (g, 0, 0, 0, 0)),
        pl.BlockSpec((1, nx, L), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, nx, nx, L), lambda g: (g, 0, 0, 0)),
        pl.BlockSpec((1, nx, nx, L), lambda g: (g, 0, 0, 0)),
        pl.BlockSpec((1, nx, nq, L), lambda g: (g, 0, 0, 0)),
        pl.BlockSpec((1, nx, L), lambda g: (g, 0, 0)),
    )

    def gridded(xu_ref, xeval_ref, goal_ref, rho_ref, dt_ref, *rest):
        model_refs = rest[:7]
        out_refs = rest[7:14]
        scratch = rest[14:]                  # CRBA launder scratch (L > 128)
        # squeeze the leading group dim of each blocked ref
        sq = lambda r: _SqueezeRef(r)
        kernel(sq(xu_ref), sq(xeval_ref), sq(goal_ref), sq(rho_ref), dt_ref,
               *model_refs, *[sq(o) for o in out_refs], *scratch)

    S, P, gamma, Qinv, A, Bm, qv = pl.pallas_call(
        gridded,
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((G, 3, nx, nx, L), dtype),
            jax.ShapeDtypeStruct((G, 3, nx, nx, L), dtype),
            jax.ShapeDtypeStruct((G, nx, L), dtype),
            jax.ShapeDtypeStruct((G, nx, nx, L), dtype),
            jax.ShapeDtypeStruct((G, nx, nx, L), dtype),
            jax.ShapeDtypeStruct((G, nx, nq, L), dtype),
            jax.ShapeDtypeStruct((G, nx, L), dtype),
        ),
        in_specs=grid_in,
        out_specs=grid_out,
        scratch_shapes=(
            [pltpu.VMEM((nq, 6, L), dtype)] if L > 128 else []),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(xu_l, xeval_l, goal_l, rho_l, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)
    return dict(S=S, Pinv=P, gamma=gamma, Qinv=Qinv, A=A, B=Bm, q=qv)


class _SqueezeRef:
    """View of a blocked ref with the leading size-1 grid dim squeezed, so
    the single-instance kernel bodies (written for unbatched shapes) run
    unchanged inside the gridded call.  The kernels only ever use full loads
    (``ref[:]``), sliced loads, and full / integer-first-axis stores."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if idx == slice(None):
            return self._ref[0]
        return self._ref[0][idx]

    def __setitem__(self, idx, val):
        if idx == slice(None):
            self._ref[0] = val
        else:
            self._ref[0, idx] = val


# ---------------------------------------------------------------------------
# packed-instance PCG kernel
# ---------------------------------------------------------------------------


def _make_pcg_kernel_packed(unroll: int, exit_criterion: str, n_inst: int,
                            knots: int):
    """Whole-CG kernel with ``n_inst`` instances packed on lanes.

    Per-instance dot products via masked full reductions; converged
    instances freeze (ops/pcg.py semantics) so per-instance iteration counts
    and iterates are exact."""

    def kern(gamma_ref, lam0_ref, S_ref, Pinv_ref, max_iter_ref, tol_ref,
             lam_ref, iters_ref, conv_ref):
        S = S_ref[:][0]
        Pinv = Pinv_ref[:][0]
        gamma = gamma_ref[:][0]                      # (n, L)
        lam0 = lam0_ref[:][0]
        max_iter = max_iter_ref[0]
        tol = tol_ref[0]
        n, L = gamma.shape
        dtype = gamma.dtype

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        inst = lane // knots                          # (1, L) instance id
        masks = [(inst == g).astype(dtype) for g in range(n_inst)]

        def segsum(x):
            """(n, L) -> list of n_inst scalars (per-instance total)."""
            return [jnp.sum(x * masks[g]) for g in range(n_inst)]

        def expand(scalars):
            """list of n_inst scalars -> (1, L) per-lane values."""
            acc = scalars[0] * masks[0]
            for g in range(1, n_inst):
                acc = acc + scalars[g] * masks[g]
            return acc

        def exit_test(rr_list, eta_list):
            if exit_criterion == "rnorm":
                return [rr < tol * tol for rr in rr_list]
            return [jnp.abs(e) < tol for e in eta_list]

        r0 = gamma - _matvec_lanes(S, lam0)
        z0 = _matvec_lanes(Pinv, r0)
        etas0 = segsum(r0 * z0)
        rr0 = segsum(r0 * r0) if exit_criterion == "rnorm" else etas0
        done0 = exit_test(rr0, etas0)

        def step(state):
            lam, r, p, etas, its, dones = state
            # freeze converged AND iteration-capped instances, exactly as the
            # single-instance kernel's `skip` (ops/pcg_pallas.py::_make_pcg_kernel)
            skip = [jnp.logical_or(dones[g], its[g] >= max_iter)
                    for g in range(n_inst)]
            skip_l = expand([s.astype(dtype) for s in skip])    # (1, L)
            act_l = 1.0 - skip_l
            Sp = _matvec_lanes(S, p)
            pSp = segsum(p * Sp)
            one = jnp.ones((), dtype)
            zero = jnp.zeros((), dtype)
            # where-guarded divisions: a frozen instance can have pSp/etas
            # exactly 0 (e.g. zero-residual start); its 0/0 NaN would leak
            # through the multiplicative lane masks (NaN*0 = NaN) and poison
            # every other instance in the group
            safe_div = lambda num, den, s: jnp.where(
                s, zero, num / jnp.where(s, one, den))
            alpha = [safe_div(etas[g], pSp[g], skip[g]) for g in range(n_inst)]
            alpha_l = expand(alpha)                             # 0 on frozen lanes
            lam_n = lam + alpha_l * p
            r_n = r - alpha_l * Sp
            z = _matvec_lanes(Pinv, r_n)
            etas_n = segsum(r_n * z)
            rr_n = segsum(r_n * r_n) if exit_criterion == "rnorm" else etas_n
            done_now = exit_test(rr_n, etas_n)
            beta = [safe_div(etas_n[g], etas[g], skip[g]) for g in range(n_inst)]
            p_n = z * act_l + expand(beta) * p + p * skip_l
            # frozen instances keep old lam/r (alpha_l already zeroed their
            # updates; p needs the explicit blend above)
            etas_k = [jnp.where(skip[g], etas[g], etas_n[g])
                      for g in range(n_inst)]
            its_k = [its[g] + (1 - skip[g].astype(jnp.int32))
                     for g in range(n_inst)]
            dones_k = [jnp.logical_or(dones[g], done_now[g])
                       for g in range(n_inst)]
            return (lam_n, r_n, p_n, etas_k, its_k, dones_k)

        def cond(state):
            *_, its, dones = state
            any_active = dones[0]
            for g in range(1, n_inst):
                any_active = jnp.logical_and(any_active, dones[g])
            it_max = its[0]
            for g in range(1, n_inst):
                it_max = jnp.maximum(it_max, its[g])
            return jnp.logical_and(it_max < max_iter,
                                   jnp.logical_not(any_active))

        def body(state):
            for _ in range(unroll):
                state = step(state)
            return state

        init = (lam0, r0, z0, etas0,
                [jnp.int32(0)] * n_inst, done0)
        lam, r, p, etas, its, dones = jax.lax.while_loop(cond, body, init)

        lam_ref[:] = lam[None]
        iters_row = its[0] * jnp.ones((1, 1), jnp.int32)
        conv_row = dones[0].astype(jnp.int32) * jnp.ones((1, 1), jnp.int32)
        for g in range(1, n_inst):
            iters_row = jnp.concatenate(
                [iters_row, its[g] * jnp.ones((1, 1), jnp.int32)], axis=1)
            conv_row = jnp.concatenate(
                [conv_row, dones[g].astype(jnp.int32) * jnp.ones((1, 1), jnp.int32)],
                axis=1)
        iters_ref[:] = iters_row[None]
        conv_ref[:] = conv_row[None]

    return kern


@highest_precision
@partial(jax.jit, static_argnames=("max_iter", "interpret", "unroll",
                                   "exit_criterion", "inst_per_prog", "knots"))
def pcg_solve_batched_lanes(S_g, P_g, gamma_g, lam0_g, knots: int,
                            inst_per_prog: int, max_iter: int = 173,
                            exit_tol=1e-6, interpret: bool = False,
                            unroll: int = 4, exit_criterion: str = "eta"):
    """Gridded packed PCG: S_g/P_g (G, 3, n, n, L), gamma/lam0 (G, n, L).

    Returns (lam (G, n, L), iters (G, I) int32, converged (G, I) bool)."""
    G, _, n, _, L = S_g.shape
    dtype = gamma_g.dtype
    I = inst_per_prog

    max_iter_arr = jnp.asarray([max_iter], jnp.int32)
    tol_arr = jnp.asarray([exit_tol], dtype)

    lam, iters, conv = pl.pallas_call(
        _make_pcg_kernel_packed(unroll, exit_criterion, I, knots),
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((G, n, L), dtype),
            jax.ShapeDtypeStruct((G, 1, I), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, I), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, n, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 3, n, n, L), lambda g: (g, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, n, n, L), lambda g: (g, 0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, I), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, I), lambda g: (g, 0, 0)),
        ),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(gamma_g, lam0_g, S_g, P_g, max_iter_arr, tol_arr)
    return lam, iters[:, 0, :], conv[:, 0, :].astype(jnp.bool_)


# ---------------------------------------------------------------------------
# gridded dz
# ---------------------------------------------------------------------------


@highest_precision
@partial(jax.jit, static_argnames=("interpret", "knots"))
def compute_dz_batched(lane_kkt: dict, lam_g, u_g, rho_b, r_cost, knots: int,
                       interpret: bool = False):
    """Gridded dz recovery: lam_g (G, nx, L), u_g (G, nq, L) -> (G, w, L)."""
    from mpcgpu_tpu.solver.kkt_pallas import _make_dz_kernel

    Qinv = lane_kkt["Qinv"]
    G, nx, _, L = Qinv.shape
    nq = nx // 2
    I = L // knots
    dtype = Qinv.dtype
    rho_l = jnp.broadcast_to(
        rho_b.reshape(G, I, 1), (G, I, knots)).reshape(G, 1, L)
    scal = jnp.asarray([r_cost], dtype)

    kernel = _make_dz_kernel(nq, L, knots=knots)

    def gridded(lam_ref, Qinv_ref, A_ref, Bm_ref, qv_ref, u_ref, rho_ref,
                scal_ref, dz_ref):
        sq = _SqueezeRef
        kernel(sq(lam_ref), sq(Qinv_ref), sq(A_ref), sq(Bm_ref), sq(qv_ref),
               sq(u_ref), sq(rho_ref), scal_ref, sq(dz_ref))

    dz = pl.pallas_call(
        gridded,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G, nx + nq, L), dtype),
        in_specs=[
            pl.BlockSpec((1, nx, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, nx, nx, L), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, nx, nx, L), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, nx, nq, L), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, nx, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, nq, L), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda g: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nx + nq, L), lambda g: (g, 0, 0)),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(lam_g, Qinv, lane_kkt["A"], lane_kkt["B"], lane_kkt["q"], u_g, rho_l,
      scal)
    return dz


# ---------------------------------------------------------------------------
# full batched fused SQP solve
# ---------------------------------------------------------------------------


@highest_precision
def sqp_solve_batched_fused(
    model: RobotModel,
    cost: CostConfig,
    sqp_cfg: SQPConfig,
    pcg_cfg: PCGConfig,
    xu_b, lam_b, xs_b, ee_b, rho_b, dt,
    integrator_type: int = 0,
    interpret: bool | None = None,
    angle_wrap: bool = False,
    merit_impl: str = "auto",
    inst_per_prog: int | None = None,
) -> SQPResult:
    """Batched SQP with the FUSED kernel pipeline (gridded over instances).

    Args shaped as parallel/batched.py: xu_b (B, N, nx+nu), lam_b (B, N, nx),
    xs_b (B, nx), ee_b (B, N, 6), rho_b (B,).  Semantics match
    vmap(sqp_solve): every instance runs its own L-M rho schedule and line
    search; all instances execute max_iter iterations (per-instance ``stop``
    freezes the iterate, as the while_loop would under vmap with freezing).
    """
    if pcg_cfg.preconditioner != "stair":
        raise ValueError("fused batched pipeline implements the stair "
                         "preconditioner only")
    B, N, w = xu_b.shape
    if N > 512:
        raise ValueError(
            f"fused batched pipeline is validated to N=512 lanes per "
            f"instance (got N={N}); use make_batched_sqp_solver(..., "
            f"fused=False) for longer horizons")
    nq = model.nq
    nx = 2 * nq
    dtype = xu_b.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    I = instances_per_program(N, B) if inst_per_prog is None else inst_per_prog
    G = B // I
    mu = jnp.asarray(sqp_cfg.mu, dtype)
    max_iter = sqp_cfg.max_iter

    if merit_impl == "auto":
        use_pallas_merit = (jax.default_backend() == "tpu"
                            and cost.mode == "ee"
                            and (sqp_cfg.num_alphas + 1) * N <= 2304)
    else:
        use_pallas_merit = merit_impl == "pallas"

    def merits_of(xu, dz, xs, ee_goal):
        if use_pallas_merit:
            from mpcgpu_tpu.solver.merit_pallas import line_search_merits_pallas

            return line_search_merits_pallas(
                model, cost, xu, dz, xs, ee_goal, mu, dt,
                num_alphas=sqp_cfg.num_alphas, integrator_type=integrator_type,
                interpret=interpret, angle_wrap=angle_wrap)
        from mpcgpu_tpu.solver.merit import line_search_merits

        return line_search_merits(
            model, cost, xu, dz, xs, ee_goal, mu, dt,
            num_alphas=sqp_cfg.num_alphas, integrator_type=integrator_type,
            include_zero=True, angle_wrap=angle_wrap)

    def body(state):
        xu, lam, rho, drho = state["xu"], state["lam"], state["rho"], state["drho"]
        it = state["it"]
        lane = build_kkt_schur_batched(
            model, cost, xu, xs_b, ee_b, rho, dt, integrator_type,
            interpret=interpret, angle_wrap=angle_wrap, inst_per_prog=I)
        lam_g = pack_lanes(lam, G, I)
        lam_new_g, lin_iters, lin_ok = pcg_solve_batched_lanes(
            lane["S"], lane["Pinv"], lane["gamma"], lam_g, N, I,
            max_iter=pcg_cfg.max_iter, exit_tol=pcg_cfg.exit_tol,
            exit_criterion=pcg_cfg.exit_criterion, interpret=interpret)
        u_g = pack_lanes(xu[:, :, nx:], G, I)
        dz_g = compute_dz_batched(lane, lam_new_g, u_g, rho, cost.r_cost, N,
                                  interpret=interpret)
        lam_new = unpack_lanes(lam_new_g, B, N)
        dz = unpack_lanes(dz_g, B, N)
        lin_iters = lin_iters.reshape(B)
        lin_ok = lin_ok.reshape(B)

        merits, alphas = jax.vmap(merits_of)(xu, dz, xs_b, ee_b)  # (B, A+1)
        merit_cur = merits[:, 0]
        best = 1 + jnp.argmin(merits[:, 1:], axis=1)              # (B,)
        min_merit = jnp.take_along_axis(merits, best[:, None], axis=1)[:, 0]
        success = min_merit < merit_cur

        drho_fail = jnp.maximum(drho * sqp_cfg.rho_factor, sqp_cfg.rho_factor)
        rho_fail = jnp.maximum(rho * drho_fail, sqp_cfg.rho_min)
        gave_up = rho_fail > sqp_cfg.rho_max
        drho_ok = jnp.minimum(drho / sqp_cfg.rho_factor, 1.0 / sqp_cfg.rho_factor)
        rho_ok = jnp.maximum(rho * drho_ok, sqp_cfg.rho_min)

        alpha_best = alphas[0][best]                              # (B,)
        frozen = state["stop"]
        take = jnp.logical_and(success, ~frozen)
        xu_new = jnp.where(take[:, None, None], xu + alpha_best[:, None, None] * dz, xu)
        lam_new = jnp.where(frozen[:, None, None], lam, lam_new)
        rho_new = jnp.where(
            success, rho_ok,
            jnp.where(gave_up, jnp.asarray(sqp_cfg.rho_reset, dtype), rho_fail))
        rho_new = jnp.where(frozen, rho, rho_new)
        drho_new = jnp.where(frozen, drho, jnp.where(success, drho_ok, drho_fail))
        merit_new = jnp.where(frozen, state["merit"],
                              jnp.where(success, min_merit, merit_cur))
        newly_stopped = jnp.logical_and(~success, gave_up)
        stop_new = jnp.logical_or(frozen, newly_stopped)

        rec = lambda buf, v: buf.at[:, it].set(
            jnp.where(frozen, buf[:, it], v))
        return dict(
            xu=xu_new, lam=lam_new, rho=rho_new, drho=drho_new,
            merit=merit_new, it=it + 1, stop=stop_new,
            gave_up=jnp.logical_or(state["gave_up"], newly_stopped),
            sqp_iters=state["sqp_iters"] + (~frozen).astype(jnp.int32),
            pcg_iters=rec(state["pcg_iters"], lin_iters),
            pcg_converged=rec(state["pcg_converged"], lin_ok),
            ls_alpha_idx=rec(state["ls_alpha_idx"],
                             jnp.where(success, (best - 1).astype(jnp.int32),
                                       jnp.int32(-1))),
        )

    init = dict(
        xu=xu_b, lam=lam_b, rho=jnp.asarray(rho_b, dtype),
        drho=jnp.ones((B,), dtype),
        merit=jnp.full((B,), jnp.inf, dtype),
        it=jnp.int32(0), stop=jnp.zeros((B,), bool),
        gave_up=jnp.zeros((B,), bool),
        sqp_iters=jnp.zeros((B,), jnp.int32),
        pcg_iters=jnp.full((B, max_iter), -1, jnp.int32),
        pcg_converged=jnp.zeros((B, max_iter), bool),
        ls_alpha_idx=jnp.full((B, max_iter), -1, jnp.int32),
    )
    final = jax.lax.while_loop(
        lambda s: jnp.logical_and(s["it"] < max_iter, ~jnp.all(s["stop"])),
        body, init)
    return SQPResult(
        xu=final["xu"], lam=final["lam"], rho=final["rho"], drho=final["drho"],
        sqp_iters=final["sqp_iters"], merit=final["merit"],
        gave_up=final["gave_up"], pcg_iters=final["pcg_iters"],
        pcg_converged=final["pcg_converged"],
        ls_alpha_idx=final["ls_alpha_idx"],
    )


def make_batched_fused_solver(model, cost, sqp_cfg, pcg_cfg, dt,
                              donate: bool = True, integrator_type: int = 0):
    """Jitted fn(xu_b, lam_b, xs_b, ee_b, rho_b) -> batched SQPResult."""

    def _solve(xu_b, lam_b, xs_b, ee_b, rho_b):
        return sqp_solve_batched_fused(
            model, cost, sqp_cfg, pcg_cfg, xu_b, lam_b, xs_b, ee_b, rho_b,
            dt, integrator_type=integrator_type)

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(_solve, donate_argnums=donate_argnums)


def sqp_solve_batched_fused_sharded(
    model, cost, sqp_cfg, pcg_cfg, xu_b, lam_b, xs_b, ee_b, rho_b, dt,
    mesh, instance_axis: str = "instance", integrator_type: int = 0,
    inst_per_prog: int | None = None,
) -> SQPResult:
    """Batch x device composition: the gridded fused pipeline, instance-
    sharded over ``mesh[instance_axis]`` with ``shard_map``.

    Each device runs the SAME gridded fused pipeline on its local B/n_dev
    instance slab — pure data parallelism, ZERO collectives in the solve
    (independent MPC problems never couple), so solves/s scales linearly
    with devices up to the HBM/ICI-free ceiling.  This composes the two
    batching layers the framework has (VERDICT r3 item 6): instances packed
    on lanes WITHIN a program (instances_per_program) and instance groups
    over the Pallas grid, now x devices over the mesh — the multi-host
    version of BASELINE's batched-MPC scaling target.

    Call this under ``jax.jit`` (or from inside a jitted loop): invoked
    eagerly it re-traces the whole gridded pipeline on every call
    (~seconds — measured round 5, benchmarks/scaling.py).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    B = xu_b.shape[0]
    n_dev = mesh.shape[instance_axis]
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by {n_dev} "
                         f"{instance_axis!r}-axis devices")
    # per-device slab must still pack lanes cleanly
    I_loc = (instances_per_program(xu_b.shape[1], B // n_dev)
             if inst_per_prog is None else inst_per_prog)
    if (B // n_dev) % I_loc:
        raise ValueError("local batch does not divide the lane packing")

    def local(xu_l, lam_l, xs_l, ee_l, rho_l):
        return sqp_solve_batched_fused(
            model, cost, sqp_cfg, pcg_cfg, xu_l, lam_l, xs_l, ee_l, rho_l,
            dt, integrator_type=integrator_type, inst_per_prog=inst_per_prog)

    spec = P(instance_axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=SQPResult(*([spec] * len(SQPResult._fields))),
        check_vma=False,   # pallas_call emits vma-less out_shapes
    )
    return fn(xu_b, lam_b, xs_b, ee_b, rho_b)
