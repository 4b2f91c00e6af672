"""Fused Pallas PCG kernel: the whole CG solve in one VMEM-resident kernel.

TPU-native analogue of the reference's single cooperative PCG kernel
(GBD-PCG; launched at pcg/sqp.cuh:230): the BTD matrix, preconditioner, and
all CG vectors live on-chip for the entire solve, eliminating per-iteration
dispatch and HBM traffic.

Data layout: the knot axis is mapped to the TPU *lane* dimension so every
per-block operation vectorizes across knots:

    S  packed as (3, n, n, N)  — S[d, i, j, k] = block-diag d, entry (i,j), knot k
    x  packed as (n, N)

The BTD matvec is then 3*n fused multiply-accumulates of (n, N) tiles, and
the off-diagonal alignment x_{k-1} / x_{k+1} is a lane roll (the circular
wraparound rows hit the structurally-zero corner blocks S[0,0] / S[N-1,2],
exactly like the ring halo in parallel/pcg_sharded.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.ops.pcg import PCGResult
from mpcgpu_tpu.precision import highest_precision


def _matvec_lanes(M, x):
    """y = BTD matvec with knots on lanes. M: (3, n, n, N), x: (n, N).

    The j-contraction is unrolled into n fused multiply-accumulates of (n, N)
    VPU tiles (j is a static tiny dim); sublane-broadcast of the (1, N) rows
    avoids Mosaic relayouts of size-1 logical dims.
    """
    n, N = x.shape
    x_prev = pltpu.roll(x, 1, axis=1)        # x[k-1] aligned at lane k
    x_next = pltpu.roll(x, N - 1, axis=1)    # x[k+1] aligned at lane k

    def contract(Md, xd):
        acc = Md[:, 0, :] * xd[0:1, :]
        for j in range(1, n):
            acc = acc + Md[:, j, :] * xd[j : j + 1, :]
        return acc

    return contract(M[1], x) + contract(M[0], x_prev) + contract(M[2], x_next)


def _make_pcg_kernel(unroll: int, exit_criterion: str = "eta"):
    def _pcg_kernel(gamma_ref, lam0_ref, S_ref, Pinv_ref, max_iter_ref, tol_ref,
                    lam_ref, iters_ref, conv_ref):
        S = S_ref[:]
        Pinv = Pinv_ref[:]
        gamma = gamma_ref[:]
        lam0 = lam0_ref[:]
        max_iter = max_iter_ref[0]
        tol = tol_ref[0]

        def exit_test(r, eta):
            # "rnorm" = the reference/GBD-PCG ||r|| < tol (SURVEY.md C17)
            if exit_criterion == "rnorm":
                return jnp.sum(r * r) < tol * tol
            return jnp.abs(eta) < tol

        r0 = gamma - _matvec_lanes(S, lam0)
        z0 = _matvec_lanes(Pinv, r0)
        eta0 = jnp.sum(r0 * z0)

        def step(state):
            """One exact CG update; no-op (masked) once done/capped."""
            lam, r, p, eta, it, done = state
            Sp = _matvec_lanes(S, p)
            alpha = eta / jnp.sum(p * Sp)
            lam_n = lam + alpha * p
            r_n = r - alpha * Sp
            z = _matvec_lanes(Pinv, r_n)
            eta_n = jnp.sum(r_n * z)
            done_n = exit_test(r_n, eta_n)
            p_n = z + (eta_n / eta) * p
            skip = jnp.logical_or(done, it >= max_iter)
            sel = lambda a, b: jnp.where(skip, a, b)
            return (
                sel(lam, lam_n), sel(r, r_n), sel(p, p_n), sel(eta, eta_n),
                sel(it, it + 1), jnp.logical_or(done, done_n),
            )

        def cond(state):
            *_, it, done = state
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def body(state):
            # `unroll` masked exact iterations per while step amortizes the
            # Mosaic loop-control overhead (compute per iteration is tiny)
            for _ in range(unroll):
                state = step(state)
            return state

        init = (lam0, r0, z0, eta0, jnp.int32(0), exit_test(r0, eta0))
        lam, r, p, eta, it, done = jax.lax.while_loop(cond, body, init)

        lam_ref[:] = lam
        iters_ref[:] = jnp.full((1, 1), it, jnp.int32)
        conv_ref[:] = jnp.full((1, 1), done.astype(jnp.int32), jnp.int32)

    return _pcg_kernel


def _make_pcg_dz_kernel(unroll: int, exit_criterion: str, nq: int):
    """The PCG kernel with the dz-recovery epilogue fused in: one kernel
    launch replaces the pcg + dz pair of the fused pipeline (one fewer
    pallas dispatch per SQP iteration; the dz operands are tiny next to
    S/Pinv already resident in VMEM)."""
    from mpcgpu_tpu.solver.kkt_pallas import (dz_from_lane_values,
                                              dz_lane_masks)

    base = _make_pcg_kernel(unroll, exit_criterion)

    def kernel(gamma_ref, lam0_ref, S_ref, Pinv_ref, Qinv_ref, A_ref, B_ref,
               qv_ref, u_ref, rho_ref, max_iter_ref, tol_ref, scal_ref,
               lam_ref, dz_ref, iters_ref, conv_ref):
        base(gamma_ref, lam0_ref, S_ref, Pinv_ref, max_iter_ref, tol_ref,
             lam_ref, iters_ref, conv_ref)
        lam = lam_ref[:]                                    # (nx, N)
        nx, N = lam.shape
        notl, notlq = dz_lane_masks(nq, N, N, lam.dtype)
        lam_n = pltpu.roll(lam, N - 1, axis=1) * notl
        dz_ref[:] = dz_from_lane_values(
            lam, lam_n, notl, notlq, Qinv_ref[:], A_ref[:], B_ref[:],
            qv_ref[:], u_ref[:], rho_ref[:], scal_ref[0])

    return kernel


@highest_precision
@partial(jax.jit, static_argnames=("max_iter", "interpret", "unroll",
                                   "exit_criterion"))
def pcg_dz_solve_pallas_lanes(lane_kkt: dict, g_l, l_l, u, rho, r_cost,
                              max_iter: int = 173, exit_tol=1e-6,
                              interpret: bool = False, unroll: int = 4,
                              exit_criterion: str = "eta"):
    """Fused PCG + dz recovery: lane-layout Schur solve then the primal
    step, one kernel.  lane_kkt: the fused KKT kernel's output dict
    (S/Pinv (3,n,n,N), Qinv/A (n,n,N), B (n,nq,N), q/gamma (n,N)); u (N,nq)
    controls; returns (lam (n,N), dz (N, n+nq), iters, converged)."""
    S_l, P_l = lane_kkt["S"], lane_kkt["Pinv"]
    _, n, _, N = S_l.shape
    nq = n // 2
    dtype = g_l.dtype
    rho_row = jnp.broadcast_to(jnp.asarray(rho, dtype), (1, N))
    max_iter_arr = jnp.asarray([max_iter], jnp.int32)
    tol_arr = jnp.asarray([exit_tol], dtype)
    scal = jnp.asarray([r_cost], dtype)

    lam_l, dz_l, iters, conv = pl.pallas_call(
        _make_pcg_dz_kernel(unroll, exit_criterion, nq),
        out_shape=(
            jax.ShapeDtypeStruct((n, N), dtype),
            jax.ShapeDtypeStruct((n + nq, N), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(g_l, l_l, S_l, P_l, lane_kkt["Qinv"], lane_kkt["A"], lane_kkt["B"],
      lane_kkt["q"], u.T, rho_row, max_iter_arr, tol_arr, scal)
    return lam_l, dz_l.T, iters[0, 0], conv[0, 0].astype(jnp.bool_)


def _pcg_slab_step_kernel(x_ref, r_ref, p_ref, s_ref, u_ref, w_ref,
                          S_ref, P_ref, injp_ref, injn_ref,
                          uinjp_ref, uinjn_ref, ab_ref,
                          xo_ref, ro_ref, po_ref, so_ref, uo_ref, wo_ref,
                          ru_ref, wu_ref, rr_ref):
    """One Chronopoulos-Gear CG step on a knot SLAB, everything VMEM-local.

    The per-shard compute of parallel/pcg_sharded.py's pipelined method
    (VERDICT r3 weak #1: it ran at XLA rates, ~8.6 us/iter vs the fused
    kernel's ~2 us/iter): the four AXPY updates, BOTH banded matvecs
    (u = Pinv r then w = S u), and the three partial dot products fuse into
    one kernel; only the psum of the dots and the 2-row boundary exchange
    stay outside (they are the collectives).

    Halo handling: roll + mask kills the slab wrap lane; `inj*` carry the
    neighbor halo contributions pre-placed at the boundary lanes (built in
    XLA from the exchanged packets, where the off-slab rows u_{-1}/u_{L}
    are also formed — they are (n,) matvecs, too small to win in-kernel).
    """
    dtype = x_ref.dtype
    n, L = x_ref.shape
    alpha = ab_ref[0]
    beta = ab_ref[1]

    p = u_ref[:] + beta * p_ref[:]
    s = w_ref[:] + beta * s_ref[:]
    x = x_ref[:] + alpha * p
    r = r_ref[:] - alpha * s

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    not_first = (lane > 0).astype(dtype)
    not_last = (lane < L - 1).astype(dtype)

    def contract(Md, xd):
        acc = Md[:, 0, :] * xd[0:1, :]
        for j in range(1, n):
            acc = acc + Md[:, j, :] * xd[j : j + 1, :]
        return acc

    S = S_ref[:]
    P = P_ref[:]
    r_prev = pltpu.roll(r, 1, axis=1) * not_first + injp_ref[:]
    r_next = pltpu.roll(r, L - 1, axis=1) * not_last + injn_ref[:]
    u = contract(P[1], r) + contract(P[0], r_prev) + contract(P[2], r_next)
    u_prev = pltpu.roll(u, 1, axis=1) * not_first + uinjp_ref[:]
    u_next = pltpu.roll(u, L - 1, axis=1) * not_last + uinjn_ref[:]
    w = contract(S[1], u) + contract(S[0], u_prev) + contract(S[2], u_next)

    xo_ref[:] = x
    ro_ref[:] = r
    po_ref[:] = p
    so_ref[:] = s
    uo_ref[:] = u
    wo_ref[:] = w
    # three separate (1, 1) scalar outputs — the Mosaic-validated pattern
    # (lane-axis concatenate of scalar tiles is not)
    ru_ref[:] = jnp.full((1, 1), jnp.sum(r * u), dtype)
    wu_ref[:] = jnp.full((1, 1), jnp.sum(w * u), dtype)
    rr_ref[:] = jnp.full((1, 1), jnp.sum(r * r), dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pcg_slab_step_pallas(x, r, p, s, u, w, S_l, P_l, inj_prev, inj_next,
                         u_inj_prev, u_inj_next, alpha, beta,
                         interpret: bool = False):
    """Lane-layout slab CG step.  x/r/p/s/u/w: (n, L); S_l/P_l: (3, n, n, L);
    inj*: (n, L) with the halo contribution at the boundary lane and zeros
    elsewhere.  Returns (x', r', p', s', u', w', dots(3,)) with
    dots = (r'.u', w'.u', r'.r') summed over the LOCAL slab only."""
    n, L = x.shape
    dtype = x.dtype
    ab = jnp.stack([jnp.asarray(alpha, dtype), jnp.asarray(beta, dtype)])
    vec = jax.ShapeDtypeStruct((n, L), dtype)
    scal = jax.ShapeDtypeStruct((1, 1), dtype)
    outs = pl.pallas_call(
        _pcg_slab_step_kernel,
        out_shape=(vec, vec, vec, vec, vec, vec, scal, scal, scal),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9),
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5},
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(x, r, p, s, u, w, S_l, P_l, inj_prev, inj_next, u_inj_prev, u_inj_next,
      ab)
    dots = jnp.concatenate([outs[6][0], outs[7][0], outs[8][0]])
    return outs[:6] + (dots,)


def _make_ca_basis_kernel(s: int, L: int):
    """s-step CG basis + Gram kernel (communication-avoiding sharded PCG,
    parallel/pcg_sharded.py method="ca_slab").

    One launch per s CG ITERATIONS (vs one per iteration for
    pcg_slab_step_pallas — amortizing the measured ~7.5 us/launch of
    kernel entry + S/Pinv staging, benchmarks/pcg_slab_cost.py): builds the
    monomial bases V = [p, (P^-1 S)p/g, ...] (s+1), W = [z, ...] (s) on the
    halo-EXTENDED slab (Le = L + 2h lanes, h = 2s+1; end-lane garbage
    propagates one lane inward per matvec and never reaches the local
    lanes), their exact S-images Ytil, and the lane-partial Gram rows
    [G = Y.Ytil (m^2) | b = Y.r (m) | F = Ytil.Ytil (m^2) | f = Ytil.r (m)
    | r.r (1)], sublane-reduced to (1, L) rows so the (cheap) lane
    reduction and the single psum happen in XLA.
    """
    h = 2 * s + 1
    m = 2 * s + 1

    def kernel(p_ref, z_ref, r_ref, S_ref, P_ref, g_ref,
               Y_ref, Yt_ref, part_ref):
        dtype = p_ref.dtype
        n, Le = p_ref.shape
        S = S_ref[:]
        P = P_ref[:]
        ginv = 1 / g_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (n, Le), 1)
        not_first = (lane > 0).astype(dtype)
        not_last = (lane < Le - 1).astype(dtype)

        def contract(Md, xd):
            acc = Md[:, 0, :] * xd[0:1, :]
            for j in range(1, n):
                acc = acc + Md[:, j, :] * xd[j : j + 1, :]
            return acc

        def matvec(M, x):
            # zero (not ring) ends: the extension replicates the global
            # matvec on interior lanes; ends are garbage by construction
            x_prev = pltpu.roll(x, 1, axis=1) * not_first
            x_next = pltpu.roll(x, Le - 1, axis=1) * not_last
            return contract(M[1], x) + contract(M[0], x_prev) \
                + contract(M[2], x_next)

        V, Vt = [p_ref[:]], []
        for _ in range(s):
            Vt.append(matvec(S, V[-1]))
            V.append(matvec(P, Vt[-1]) * ginv)
        Vt.append(matvec(S, V[-1]))
        W, Wt = [z_ref[:]], []
        for _ in range(s - 1):
            Wt.append(matvec(S, W[-1]))
            W.append(matvec(P, Wt[-1]) * ginv)
        Wt.append(matvec(S, W[-1]))

        Yl = [y[:, h:h + L] for y in V + W]      # local lanes only
        Ytl = [y[:, h:h + L] for y in Vt + Wt]
        r = r_ref[:]
        for a in range(m):
            Y_ref[a] = Yl[a]
            Yt_ref[a] = Ytl[a]
        row = 0
        for a in range(m):
            for b_i in range(m):
                part_ref[row : row + 1, :] = jnp.sum(
                    Yl[a] * Ytl[b_i], axis=0, keepdims=True)
                row += 1
        for a in range(m):
            part_ref[row : row + 1, :] = jnp.sum(
                Yl[a] * r, axis=0, keepdims=True)
            row += 1
        for a in range(m):
            for b_i in range(m):
                part_ref[row : row + 1, :] = jnp.sum(
                    Ytl[a] * Ytl[b_i], axis=0, keepdims=True)
                row += 1
        for a in range(m):
            part_ref[row : row + 1, :] = jnp.sum(
                Ytl[a] * r, axis=0, keepdims=True)
            row += 1
        part_ref[row : row + 1, :] = jnp.sum(r * r, axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("s_steps", "interpret"))
def pcg_ca_basis_pallas(p_ext, z_ext, r_l, S_ext_l, P_ext_l, g,
                        s_steps: int = 4, interpret: bool = False):
    """Lane-layout CA basis kernel.  p_ext/z_ext: (n, Le) halo-extended;
    r_l: (n, L) local; S_ext_l/P_ext_l: (3, n, n, Le); g: global basis
    scale.  Returns (Y (m, n, L), Ytil (m, n, L), parts (2m^2+2m+1,) of
    LANE-REDUCED local Gram entries, ordered [G | b | F | f | rr])."""
    s = s_steps
    m = 2 * s + 1
    n, Le = p_ext.shape
    L = r_l.shape[1]
    dtype = r_l.dtype
    nrows = 2 * m * m + 2 * m + 1
    Y, Yt, part = pl.pallas_call(
        _make_ca_basis_kernel(s, L),
        out_shape=(
            jax.ShapeDtypeStruct((m, n, L), dtype),
            jax.ShapeDtypeStruct((m, n, L), dtype),
            jax.ShapeDtypeStruct((nrows, L), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(p_ext, z_ext, r_l, S_ext_l, P_ext_l, jnp.reshape(g, (1,)))
    return Y, Yt, jnp.sum(part, axis=1)


@highest_precision
@partial(jax.jit, static_argnames=("max_iter", "interpret", "unroll",
                                   "exit_criterion"))
def pcg_solve_pallas(S, Pinv, gamma, lam0, max_iter: int = 173, exit_tol=1e-6,
                     interpret: bool = False, unroll: int = 4,
                     exit_criterion: str = "eta") -> PCGResult:
    """Drop-in replacement for ops.pcg.pcg_solve (single chip, fused kernel).

    Accepts the standard (N, 3, n, n) BTD layout; transposition to the
    lane-packed layout happens in XLA (fused with upstream Schur formation).
    """
    if S.shape[1] != 3 or Pinv.shape[1] != 3:
        # the kernel's _matvec_lanes hardcodes the 3-band BTD stencil; a
        # 5-band operand (e.g. preconditioner="stair2") would be silently
        # misread as a wrong non-symmetric 3-band operator (ADVICE r3)
        raise ValueError(
            f"pcg_solve_pallas requires 3-band BTD operands; got S bands "
            f"{S.shape[1]}, Pinv bands {Pinv.shape[1]} — use linsys='pcg' "
            f"(XLA path) for wider-band preconditioners")
    S_l = jnp.transpose(S, (1, 2, 3, 0))       # (3, n, n, N)
    P_l = jnp.transpose(Pinv, (1, 2, 3, 0))
    g_l = jnp.transpose(gamma, (1, 0))          # (n, N)
    l_l = jnp.transpose(lam0, (1, 0))
    res = pcg_solve_pallas_lanes(S_l, P_l, g_l, l_l, max_iter=max_iter,
                                 exit_tol=exit_tol, interpret=interpret,
                                 unroll=unroll, exit_criterion=exit_criterion)
    return PCGResult(lam=res.lam.T, iters=res.iters, converged=res.converged)


@highest_precision
@partial(jax.jit, static_argnames=("max_iter", "interpret", "unroll",
                                   "exit_criterion"))
def pcg_solve_pallas_lanes(S_l, P_l, g_l, l_l, max_iter: int = 173,
                           exit_tol=1e-6, interpret: bool = False,
                           unroll: int = 4,
                           exit_criterion: str = "eta") -> PCGResult:
    """Lane-layout entry: S/Pinv (3, n, n, N), gamma/lam0 (n, N).

    Used by the fused KKT+Schur kernel path (solver/kkt_pallas.py), which
    emits this layout directly so no transposes sit between the kernels.
    Returns PCGResult with lam in (n, N) lane layout.
    """
    _, n, _, N = S_l.shape
    dtype = g_l.dtype

    max_iter_arr = jnp.asarray([max_iter], jnp.int32)
    tol_arr = jnp.asarray([exit_tol], dtype)

    lam_l, iters, conv = pl.pallas_call(
        _make_pcg_kernel(unroll, exit_criterion),
        out_shape=(
            jax.ShapeDtypeStruct((n, N), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(g_l, l_l, S_l, P_l, max_iter_arr, tol_arr)

    return PCGResult(
        lam=lam_l,
        iters=iters[0, 0],
        converged=conv[0, 0].astype(jnp.bool_),
    )
