"""Knot-sharded FULL SQP iteration: the entire solve as one SPMD program.

Extends parallel/pcg_sharded.py (which shards only the linear solve) to the
whole pipeline for long horizons spanning multiple chips (BASELINE
configs[4]: N=512 row-partitioned with halo exchange): KKT assembly and cost
blocks are embarrassingly knot-parallel; the Schur condensation, dz recovery,
and merit defects each need exactly ONE neighbor block-row per stage (the
coupling is block-tridiagonal), exchanged over the ICI ring with `ppermute`;
the line-search merits and CG dot products reduce with `psum`.

Communication per SQP iteration: 1 halo packet (Schur), 2 block halos
(stair preconditioner), 2 ppermutes + 2 psums per PCG iteration, 1 halo
(dz), 1 halo + 1 psum (line search) — all O(block size), independent of the
local slab length.

Semantics match solver/sqp.py::sqp_solve (linsys="pcg", stair
preconditioner) — tests/test_parallel.py checks equality on the virtual CPU
mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.smallmat import gj_inverse
from mpcgpu_tpu.parallel.pcg_sharded import (
    _pcg_local, _pcg_local_ca, _pcg_local_ca_slab, _pcg_local_pipelined,
    _pcg_local_pipelined_slab)
from mpcgpu_tpu.precision import highest_precision
from mpcgpu_tpu.solver.kkt import euler_step_and_jacobians, tracking_cost_grad_hess
from mpcgpu_tpu.solver.sqp import SQPResult


def _send_right(x, axis):
    """Every shard receives its LEFT neighbor's value (ring)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i, (i + 1) % n) for i in range(n)])


def _send_left(x, axis):
    """Every shard receives its RIGHT neighbor's value (ring)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i, (i - 1) % n) for i in range(n)])


@highest_precision
def sqp_solve_sharded(
    model: RobotModel,
    cost: CostConfig,
    sqp_cfg: SQPConfig,
    pcg_cfg: PCGConfig,
    xu, lam, xs, ee_goal, rho, dt,
    mesh: Mesh,
    integrator_type: int = 0,
    knot_axis: str = "knot",
    iter_budget=None,
    fused: bool | str = "auto",
    pcg_method: str = "auto",
    pcg_s_steps: int = 4,
) -> SQPResult:
    """Full SQP solve with (N, ...) arrays sharded over mesh[knot_axis].

    iter_budget: optional TRACED iteration cap <= sqp_cfg.max_iter — the
    on-device sqpTimecheck equivalent (pcg/sqp.cuh:161-169), same semantics
    as solver/sqp.py::sqp_solve's iter_budget: the MPC layer converts
    SQP_MAX_TIME_US into an iteration count via one-time calibration.

    fused: run the shard-LOCAL compute through the fused Pallas kernel
    pipeline (slab KKT+Schur+stair with 2-knot halos, slab dz, slab merit
    partials) instead of the per-knot XLA twins, so the multi-chip path gets
    single-chip kernel economics (the knot-parallel grid axis of
    kkt.cuh:61 extended across chips).  "auto" = on TPU when the slab shape
    qualifies (ee cost, stair preconditioner, slab length >= 2).

    pcg_method: "pipelined" (Chronopoulos-Gear, 1 psum + 1 halo exchange
    per CG iteration), "classic", or the s-step communication-avoiding
    forms "ca" / "ca_slab" (ONE psum + ONE halo exchange per `pcg_s_steps`
    ITERATIONS; "ca_slab" runs the per-shard basis compute in one Pallas
    kernel per outer step) — see parallel/pcg_sharded.py.  Slabs narrower
    than the 2s+1 halo fall back to "pipelined".

    "auto" (default) picks the production method from the measured round-5
    economics (benchmarks/pcg_slab_cost.py, RESULTS stage=pcg_ca_cost:
    ca_slab 6.00 us/iter vs pipelined_slab 8.98 at slab 64, collective
    budget divided by s): "ca_slab" when the fused pipeline runs and the
    slab fits the 2s+1 halo, else "pipelined" (which the fused path
    promotes to the per-iteration slab kernel when the slab allows).
    """
    N = xu.shape[0]
    nq = model.nq
    nx = 2 * nq
    dtype = xu.dtype
    n_shard = mesh.shape[knot_axis]
    if N % n_shard:
        raise ValueError(f"N={N} not divisible by {n_shard} knot shards")
    if pcg_cfg.preconditioner not in ("stair", "jacobi", "none"):
        raise ValueError(f"unknown preconditioner {pcg_cfg.preconditioner!r}")
    L = N // n_shard
    if fused == "auto":
        fused = (jax.default_backend() == "tpu" and cost.mode == "ee"
                 and pcg_cfg.preconditioner == "stair" and L >= 2)
    if fused:
        if cost.mode != "ee" or pcg_cfg.preconditioner != "stair":
            raise ValueError(
                "fused sharded SQP requires ee cost mode and the stair "
                "preconditioner (the slab kernel emits stair Pinv)")
        if L < 2:
            raise ValueError(f"fused slab path needs slab length >= 2, got {L}")
    interpret = jax.default_backend() != "tpu"
    mu = jnp.asarray(sqp_cfg.mu, dtype)
    dt = jnp.asarray(dt, dtype)
    alphas = jnp.concatenate([
        jnp.zeros((1,), dtype), -1.0 / (2.0 ** jnp.arange(sqp_cfg.num_alphas, dtype=dtype))
    ])
    # fused path: the PCG per-shard compute also runs the slab Pallas kernel
    # (1 kernel + 1 psum + 1 bidirectional exchange per CG iteration) so the
    # dominant stage gets kernel economics too (VERDICT r3 weak #1)
    if pcg_method == "auto":
        pcg_method = ("ca_slab" if fused and L >= 2 * pcg_s_steps + 1
                      else "pipelined")
    if pcg_method.startswith("ca") and L < 2 * pcg_s_steps + 1:
        pcg_method = "pipelined"       # halo packets carry 2s+1 rows/side
    pcg_slab = (pcg_method == "pipelined_slab"
                or (fused and pcg_method == "pipelined" and L >= 2))
    if pcg_method == "ca":
        _pcg_impl = partial(_pcg_local_ca, s_steps=pcg_s_steps)
    elif pcg_method == "ca_slab":
        _pcg_impl = partial(_pcg_local_ca_slab, s_steps=pcg_s_steps,
                            interpret=interpret)
    elif pcg_slab:
        _pcg_impl = partial(_pcg_local_pipelined_slab, interpret=interpret)
    elif pcg_method == "pipelined":
        _pcg_impl = _pcg_local_pipelined
    else:
        _pcg_impl = _pcg_local

    def local(xu_loc, lam_loc, ee_loc, xs_rep, rho0, iter_bound):
        ax = knot_axis
        shard = jax.lax.axis_index(ax)
        gpos = shard * L + jnp.arange(L)                 # global knot indices
        is_g0 = (gpos == 0)
        is_gl = (gpos == N - 1)

        def build_blocks(xu_loc):
            x = xu_loc[:, :nx]
            u = xu_loc[:, nx:]
            xnext, A, B = jax.vmap(
                lambda xx, uu: euler_step_and_jacobians(model, xx, uu, dt,
                                                        integrator_type)
            )(x, u)
            # terminal-eval quirk (solver/kkt.py:164-167): with
            # terminal_at_last_state=False the global LAST knot's cost blocks
            # are evaluated at x_{N-2} — the previous local row, or the left
            # neighbor's last row when the slab length is 1
            x_eval = x
            if not cost.terminal_at_last_state:
                prev_row = (x[-2] if L >= 2 else _send_right(x[-1], ax))
                x_eval = jnp.where(
                    is_gl[:, None],
                    jnp.broadcast_to(prev_row[None, :], x.shape), x)
            Q, q, R, r = jax.vmap(
                lambda xx, uu, gg: tracking_cost_grad_hess(model, cost, xx, uu, gg)
            )(x_eval, u, ee_loc)
            # defect c_k = x_k - xnext_{k-1}; global row 0: x_0 - xs
            xnext_left = _send_right(xnext[-1], ax)
            xnext_prev = jnp.concatenate([xnext_left[None], xnext[:-1]], axis=0)
            c = jnp.where(is_g0[:, None], x - xs_rep[None, :], x - xnext_prev)
            return x, u, xnext, A, B, Q, q, R, r, c

        def form_schur(A, B, Q, q, R, r, c, rho):
            eyex = jnp.eye(nx, dtype=dtype)
            eyeu = jnp.eye(nq, dtype=dtype)
            Qinv = gj_inverse(Q + rho * eyex)
            Rinv = gj_inverse(R + rho * eyeu)
            AQ = jnp.einsum("kij,kjl->kil", A, Qinv)
            BR = jnp.einsum("kij,kjl->kil", B, Rinv)
            T = (jnp.einsum("kij,klj->kil", AQ, A)
                 + jnp.einsum("kij,klj->kil", BR, B))
            aqq = jnp.einsum("kij,kj->ki", AQ, q)
            brr = jnp.einsum("kij,kj->ki", BR, r)
            # one packed halo from the left neighbor
            packet = (T[-1], AQ[-1], aqq[-1], brr[-1])
            T_l, AQ_l, aqq_l, brr_l = _send_right(packet, ax)
            T_prev = jnp.concatenate([T_l[None], T[:-1]], axis=0)
            AQ_prev = jnp.concatenate([AQ_l[None], AQ[:-1]], axis=0)
            aqq_prev = jnp.concatenate([aqq_l[None], aqq[:-1]], axis=0)
            brr_prev = jnp.concatenate([brr_l[None], brr[:-1]], axis=0)
            z_blk = jnp.zeros((nx, nx), dtype)
            theta = Qinv + jnp.where(is_g0[:, None, None], 0.0, T_prev)
            phi = jnp.where(is_g0[:, None, None], z_blk, -AQ_prev)
            phiT = jnp.where(is_gl[:, None, None], z_blk,
                             -jnp.swapaxes(AQ, -1, -2))
            gamma = jnp.einsum("kij,kj->ki", Qinv, q) - jnp.where(
                is_g0[:, None], 0.0, c + aqq_prev + brr_prev)
            S = jnp.stack([phi, theta, phiT], axis=1)
            zero3 = jnp.zeros_like(S[:, 0])
            if pcg_cfg.preconditioner == "none":
                eyeblk = jnp.broadcast_to(eyex, S[:, 1].shape)
                Pinv = jnp.stack([zero3, eyeblk, zero3], axis=1)
                return S, Pinv, gamma, Qinv, Rinv
            D = gj_inverse(theta)
            if pcg_cfg.preconditioner == "jacobi":
                Pinv = jnp.stack([zero3, D, zero3], axis=1)
                return S, Pinv, gamma, Qinv, Rinv
            # stair preconditioner: off-diags need both neighbors' D
            D_l = _send_right(D[-1], ax)
            D_r = _send_left(D[0], ax)
            D_prev = jnp.concatenate([D_l[None], D[:-1]], axis=0)
            D_next = jnp.concatenate([D[1:], D_r[None]], axis=0)
            left = jnp.where(is_g0[:, None, None], z_blk,
                             -jnp.einsum("kij,kjl,klm->kim", D, phi, D_prev))
            right = jnp.where(is_gl[:, None, None], z_blk,
                              -jnp.einsum("kij,kjl,klm->kim", D, phiT, D_next))
            Pinv = jnp.stack([left, D, right], axis=1)
            return S, Pinv, gamma, Qinv, Rinv

        def compute_dz(A, B, q, r, Qinv, Rinv, lam_loc):
            lam_r = _send_left(lam_loc[0], ax)
            lam_next = jnp.concatenate([lam_loc[1:], lam_r[None]], axis=0)
            at_lam = jnp.einsum("kji,kj->ki", A, lam_next)
            rhs_x = q - lam_loc + jnp.where(is_gl[:, None], 0.0, at_lam)
            dx = jnp.einsum("kij,kj->ki", Qinv, rhs_x)
            bt_lam = jnp.einsum("kji,kj->ki", B, lam_next)
            du = jnp.einsum("kij,kj->ki", Rinv, r + bt_lam)
            du = jnp.where(is_gl[:, None], 0.0, du)
            return jnp.concatenate([dx, du], axis=-1)

        def merits_of(xu_loc, dz_loc):
            """l1-penalty merits of all alphas; one halo + one psum."""
            from mpcgpu_tpu.solver.kkt import integrator_step

            # next global knot's candidate state, per alpha
            x0r, dz0r = _send_left((xu_loc[0, :nx], dz_loc[0, :nx]), ax)

            def one(alpha):
                cand = xu_loc + alpha * dz_loc
                x, u = cand[:, :nx], cand[:, nx:]
                xn = jax.vmap(lambda xx, uu: integrator_step(
                    model, xx, uu, dt, integrator_type))(x, u)
                x_next = jnp.concatenate(
                    [x[1:], (x0r + alpha * dz0r)[None]], axis=0)
                defect = jnp.sum(jnp.abs(x_next - xn), axis=-1)
                defect = jnp.where(is_gl, 0.0, defect)
                from mpcgpu_tpu.solver.merit import tracking_cost

                J = tracking_cost(model, cost, cand, ee_loc)
                # tracking_cost masks its own last row's control term by
                # LOCAL position; correct globally only at the last shard —
                # add the dropped term back elsewhere
                u_last = cand[-1, nx:]
                extra = 0.5 * cost.r_cost * jnp.sum(u_last**2)
                J = J + jnp.where(shard == n_shard - 1, 0.0, extra)
                x0_res = jnp.where(
                    shard == 0, jnp.sum(jnp.abs(x[0] - xs_rep)), 0.0)
                return J + mu * (jnp.sum(defect) + x0_res)

            local_merits = jax.vmap(one)(alphas)
            return jax.lax.psum(local_merits, ax)

        # ---- fused slab stages (Pallas kernels per shard) ----
        H = 2   # halo depth: the stair Pinv's D_{k-1} has a 2-hop dependency
        gmod = jnp.mod(shard * L + jnp.arange(-H, L + H), N)
        first_m_ext = (gmod == 0).astype(dtype)
        last_m_ext = (gmod == N - 1).astype(dtype)

        def halo2(v):
            """Extend a (L, ...) slab with 2 ring-halo rows per side.  The
            wrap-around rows at the global edges feed only masked-out terms
            (see build_kkt_schur_pallas_slab's boundary-mask contract)."""
            fl = _send_right(v[-H:], ax)
            fr = _send_left(v[:H], ax)
            return jnp.concatenate([fl, v, fr], axis=0)

        ee_ext = halo2(ee_loc) if fused else None   # loop-invariant

        def build_fused(xu_loc, rho):
            from mpcgpu_tpu.solver.kkt_pallas import build_kkt_schur_pallas_slab

            xu_ext = halo2(xu_loc)
            x_ext = xu_ext[:, :nx]
            if cost.terminal_at_last_state:
                x_eval_ext = x_ext
            else:
                # terminal quirk: global-last cost blocks evaluated at the
                # previous knot's state (in-slab: the global-last lane is
                # never lane 0 of the extended slab)
                x_prev = jnp.concatenate([x_ext[:1], x_ext[:-1]], axis=0)
                x_eval_ext = jnp.where(last_m_ext[:, None] > 0, x_prev, x_ext)
            lane = build_kkt_schur_pallas_slab(
                model, cost, xu_ext, x_eval_ext, ee_ext,
                first_m_ext, last_m_ext, rho, dt,
                integrator_type=integrator_type, interpret=interpret)
            return {k: v[..., H : H + L] for k, v in lane.items()}

        def dz_fused(lane, xu_loc, lam_new, rho):
            from mpcgpu_tpu.solver.kkt_pallas import compute_dz_pallas_slab

            lam_r = _send_left(lam_new[0], ax)
            lam_next = jnp.concatenate([lam_new[1:], lam_r[None]], axis=0)
            return compute_dz_pallas_slab(
                lane, lam_new, lam_next, is_gl.astype(dtype),
                xu_loc[:, nx:], rho, cost.r_cost, interpret=interpret)

        def merits_fused(xu_loc, dz_loc):
            """Slab merit-partials kernel + boundary corrections + 1 psum."""
            from mpcgpu_tpu.solver.merit_pallas import (
                line_search_merit_partials_slab)

            x0r, dz0r = _send_left((xu_loc[0], dz_loc[0]), ax)
            xu_e = jnp.concatenate([xu_loc, x0r[None]], axis=0)
            dz_e = jnp.concatenate([dz_loc, dz0r[None]], axis=0)
            ee_e = jnp.concatenate([ee_loc, ee_loc[:1]], axis=0)
            cost_pl, defect_pl, _ = line_search_merit_partials_slab(
                model, cost, xu_e, dz_e, ee_e, dt,
                num_alphas=sqp_cfg.num_alphas,
                integrator_type=integrator_type, interpret=interpret)
            cost_pl = cost_pl[:, :L]                 # drop the halo lane
            defect_pl = defect_pl[:, :L]
            glf = is_gl.astype(dtype)
            # the kernel's per-lane cost includes the control penalty at
            # every interior lane; the global LAST knot has none
            # (iiwa_eepos_plant.cuh:381-401 terminal block)
            cand_u = (xu_loc[None, :, nx:]
                      + alphas[:, None, None] * dz_loc[None, :, nx:])
            extra = 0.5 * cost.r_cost * jnp.sum(
                glf[None, :, None] * cand_u * cand_u, axis=(1, 2))
            cost_tot = jnp.sum(cost_pl, axis=1) - extra
            defect_tot = jnp.sum(defect_pl * (1.0 - glf)[None, :], axis=1)
            cand_x0 = xu_loc[0, :nx] + alphas[:, None] * dz_loc[0, :nx]
            x0_res = jnp.where(
                shard == 0,
                jnp.sum(jnp.abs(cand_x0 - xs_rep[None, :]), axis=1), 0.0)
            return jax.lax.psum(
                cost_tot + mu * (defect_tot + x0_res), ax)

        def body(state):
            xu_loc, lam_loc, rho, drho, it = (
                state["xu"], state["lam"], state["rho"], state["drho"],
                state["it"])
            if fused:
                lane = build_fused(xu_loc, rho)
                if pcg_method == "ca_slab":
                    # s-step basis kernel fed in the KKT kernel's native
                    # lane layout, one launch per pcg_s_steps iterations
                    lam_new, lin_iters, lin_ok = _pcg_local_ca_slab(
                        lane["S"], lane["Pinv"], lane["gamma"], lam_loc,
                        pcg_cfg.max_iter, pcg_cfg.exit_tol, ax,
                        exit_criterion=pcg_cfg.exit_criterion,
                        s_steps=pcg_s_steps, interpret=interpret,
                        lane_inputs=True)
                elif pcg_slab:
                    # feed the slab PCG in the KKT kernel's native lane
                    # layout — no knot-leading round-trip per SQP iteration
                    lam_new, lin_iters, lin_ok = _pcg_local_pipelined_slab(
                        lane["S"], lane["Pinv"], lane["gamma"], lam_loc,
                        pcg_cfg.max_iter, pcg_cfg.exit_tol, ax,
                        exit_criterion=pcg_cfg.exit_criterion,
                        interpret=interpret, lane_inputs=True)
                else:
                    S = jnp.transpose(lane["S"], (3, 0, 1, 2))
                    Pinv = jnp.transpose(lane["Pinv"], (3, 0, 1, 2))
                    gamma = lane["gamma"].T
                    lam_new, lin_iters, lin_ok = _pcg_impl(
                        S, Pinv, gamma, lam_loc, pcg_cfg.max_iter,
                        pcg_cfg.exit_tol, ax,
                        exit_criterion=pcg_cfg.exit_criterion)
            else:
                x, u, xnext, A, B, Q, q, R, r, c = build_blocks(xu_loc)
                S, Pinv, gamma, Qinv, Rinv = form_schur(A, B, Q, q, R, r, c, rho)
                lam_new, lin_iters, lin_ok = _pcg_impl(
                    S, Pinv, gamma, lam_loc, pcg_cfg.max_iter,
                    pcg_cfg.exit_tol, ax,
                    exit_criterion=pcg_cfg.exit_criterion)
            if fused:
                dz = dz_fused(lane, xu_loc, lam_new, rho)
                merits = merits_fused(xu_loc, dz)
            else:
                dz = compute_dz(A, B, q, r, Qinv, Rinv, lam_new)
                merits = merits_of(xu_loc, dz)
            merit_cur = merits[0]
            best = 1 + jnp.argmin(merits[1:])
            min_merit = merits[best]
            success = min_merit < merit_cur
            drho_fail = jnp.maximum(drho * sqp_cfg.rho_factor, sqp_cfg.rho_factor)
            rho_fail = jnp.maximum(rho * drho_fail, sqp_cfg.rho_min)
            gave_up = rho_fail > sqp_cfg.rho_max
            drho_ok = jnp.minimum(drho / sqp_cfg.rho_factor, 1.0 / sqp_cfg.rho_factor)
            rho_ok = jnp.maximum(rho * drho_ok, sqp_cfg.rho_min)
            xu_new = jnp.where(success, xu_loc + alphas[best] * dz, xu_loc)
            rho_new = jnp.where(
                success, rho_ok,
                jnp.where(gave_up, jnp.asarray(sqp_cfg.rho_reset, dtype), rho_fail))
            return dict(
                xu=xu_new, lam=lam_new, rho=rho_new,
                drho=jnp.where(success, drho_ok, drho_fail),
                merit=jnp.where(success, min_merit, merit_cur),
                it=it + 1,
                stop=jnp.logical_and(~success, gave_up),
                gave_up=jnp.logical_or(state["gave_up"],
                                       jnp.logical_and(~success, gave_up)),
                pcg_iters=state["pcg_iters"].at[it].set(lin_iters),
                pcg_converged=state["pcg_converged"].at[it].set(lin_ok),
                ls_alpha_idx=state["ls_alpha_idx"].at[it].set(
                    jnp.where(success, (best - 1).astype(jnp.int32), -1)),
            )

        init = dict(
            xu=xu_loc, lam=lam_loc, rho=jnp.asarray(rho0, dtype),
            drho=jnp.asarray(1.0, dtype), merit=jnp.asarray(jnp.inf, dtype),
            it=jnp.int32(0), stop=jnp.bool_(False), gave_up=jnp.bool_(False),
            pcg_iters=jnp.full((sqp_cfg.max_iter,), -1, jnp.int32),
            pcg_converged=jnp.zeros((sqp_cfg.max_iter,), jnp.bool_),
            ls_alpha_idx=jnp.full((sqp_cfg.max_iter,), -1, jnp.int32),
        )
        final = jax.lax.while_loop(
            lambda s: jnp.logical_and(s["it"] < iter_bound, ~s["stop"]),
            body, init)
        return (final["xu"], final["lam"], final["rho"], final["drho"],
                final["it"], final["merit"], final["gave_up"],
                final["pcg_iters"], final["pcg_converged"],
                final["ls_alpha_idx"])

    if iter_budget is None:
        iter_bound = jnp.int32(sqp_cfg.max_iter)
    else:
        iter_bound = jnp.minimum(jnp.int32(sqp_cfg.max_iter),
                                 jnp.asarray(iter_budget, jnp.int32))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(knot_axis), P(knot_axis), P(knot_axis), P(), P(), P()),
        out_specs=(P(knot_axis), P(knot_axis), P(), P(), P(), P(), P(), P(),
                   P(), P()),
        # pallas_call emits vma-less out_shapes, incompatible with
        # shard_map's varying-mesh-axes check (fused slab kernels AND the
        # slab-step PCG kernel)
        check_vma=not (fused or pcg_slab),
    )
    out = fn(xu, lam, ee_goal, xs, jnp.asarray(rho, dtype), iter_bound)
    return SQPResult(xu=out[0], lam=out[1], rho=out[2], drho=out[3],
                     sqp_iters=out[4], merit=out[5], gave_up=out[6],
                     pcg_iters=out[7], pcg_converged=out[8],
                     ls_alpha_idx=out[9])
