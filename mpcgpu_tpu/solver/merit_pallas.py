"""Fused Pallas line-search merit kernel: all candidates, one VMEM pass.

The XLA lowering of the vmapped merit (solver/merit.py) compiles to ~200
fusions that materialize ~180 MB of (alphas, knots, ...) intermediates in
HBM — the line search is pure bandwidth waste on tensors that total a few
hundred KB of live data.  This kernel evaluates the FULL l1-penalty merit
    phi(xu + alpha_i dz) = sum_k J_k + mu * sum_k |c_k|_1
for every alpha in one VMEM-resident pass: articulated-body forward dynamics
(same recursion as models/dynamics.py::forward_dynamics_aba), Euler /
semi-implicit defects, and the ee-tracking cost (FK via homogeneous
transforms), for all (alpha, knot) points batched on the TPU lane dimension.

Layout: every per-sample quantity is (components, A*N) with lane index
l = a * N + k; spatial vectors are (6, B) tiles, spatial matrices (6, 6, B).
Knot coupling (the defect needs x_{k+1}) is a single lane roll, with the
k = N-1 wraparound lanes masked out — the same trick as ops/pcg_pallas.py.

Role equivalence: ls_gato_compute_merit, include/common/merit.cuh:17-94
(the reference runs 8 cooperative launches on 8 streams; here one kernel
evaluates all candidates plus alpha = 0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.precision import highest_precision


def _rowsum(x):
    """sum over axis 0 -> (1, B), as unrolled row adds (Mosaic's
    multi_reduction rejects inputs whose layout carries sublane offsets,
    which slices like IA[:, 2, :] or cand[nq:nx] produce)."""
    acc = x[0:1, :]
    for i in range(1, x.shape[0]):
        acc = acc + x[i : i + 1, :]
    return acc


def _cross(a, b):
    """Row-cyclic cross product on (3, B) tiles: 4 sublane rolls + 2 mul + sub."""
    ar1 = pltpu.roll(a, 2, axis=0)   # [a1, a2, a0]
    br2 = pltpu.roll(b, 1, axis=0)   # [b2, b0, b1]
    ar2 = pltpu.roll(a, 1, axis=0)   # [a2, a0, a1]
    br1 = pltpu.roll(b, 2, axis=0)   # [b1, b2, b0]
    return ar1 * br2 - ar2 * br1


def _crf_apply(v, f):
    """v x* f for (6, B) spatial tiles."""
    w, vo = v[0:3], v[3:6]
    fw, fv = f[0:3], f[3:6]
    return jnp.concatenate([_cross(w, fw) + _cross(vo, fv), _cross(w, fv)], axis=0)


def _matvec(M, x):
    """(6,6,B) @ (6,B) -> (6,B): 6 lane-broadcast FMAs."""
    acc = M[:, 0, :] * x[0:1, :]
    for j in range(1, 6):
        acc = acc + M[:, j, :] * x[j : j + 1, :]
    return acc


def _matvec_const(M, x):
    """(6,6) const @ (6,B) -> (6,B)."""
    acc = M[:, 0:1] * x[0:1, :]
    for j in range(1, 6):
        acc = acc + M[:, j : j + 1] * x[j : j + 1, :]
    return acc


def _matvec_T(M, x):
    """M^T @ x for M (6,6,B), x (6,B)."""
    acc = M[0, :, :] * x[0:1, :]
    for j in range(1, 6):
        acc = acc + M[j, :, :] * x[j : j + 1, :]
    return acc


def _matmat(Ma, Mb):
    """(6,6,B) @ (6,6,B) -> (6,6,B)."""
    cols = [_matvec(Ma, Mb[:, l, :]) for l in range(6)]
    return jnp.stack(cols, axis=1)


def _matmat_TA(Ma, Mb):
    """Ma^T @ Mb for (6,6,B) operands."""
    cols = [_matvec_T(Ma, Mb[:, l, :]) for l in range(6)]
    return jnp.stack(cols, axis=1)


def _make_merit_kernel(nq: int, N: int, A: int, integrator_type: int,
                       gravity: float, qd_cost: float, r_cost: float,
                       angle_wrap: bool = False):
    nx = 2 * nq
    B = A * N

    def kernel(cand_ref, goal_ref, dt_ref,
               xc_ref, xs_ref, xco_ref, I_ref, hc_ref, hs_ref, hco_ref,
               out_ref):
        cand = cand_ref[:]                       # (nx+nu, B)
        dt = dt_ref[0]
        q = cand[0:nq]
        qd = cand[nq:nx]
        u = cand[nx : nx + nq]
        s = jnp.sin(q)                           # (nq, B)
        c = jnp.cos(q)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        k_idx = lane % N
        not_last = (k_idx < N - 1).astype(cand.dtype)      # (1, B)
        row6 = jax.lax.broadcasted_iota(jnp.int32, (6, B), 0)
        ez_mask = (row6 == 2).astype(cand.dtype)           # e_z on (6, B)

        # per-joint spatial transforms X_j(q_j): affine in (sin, cos)
        X = []
        for j in range(nq):
            sj = s[j : j + 1, :][None]                     # (1, 1, B)
            cj = c[j : j + 1, :][None]
            Xj = (xc_ref[j][:, :, None]
                  + sj * xs_ref[j][:, :, None]
                  + cj * xco_ref[j][:, :, None])           # (6, 6, B)
            X.append(Xj)

        # ---- ABA pass 1: velocities, bias accelerations, bias forces ----
        v_par = None
        vs, cs_, pA = [], [], []
        for j in range(nq):
            qdj = qd[j : j + 1, :]                         # (1, B)
            if v_par is None:
                vj = ez_mask * qdj
            else:
                vj = _matvec(X[j], v_par) + ez_mask * qdj
            # c_j = v_j x (e_z qd_j) = qd_j * [v1, -v0, 0, v4, -v3, 0]
            zero1 = jnp.zeros_like(qdj)
            cj_ = qdj * jnp.concatenate(
                [vj[1:2], -vj[0:1], zero1, vj[4:5], -vj[3:4], zero1], axis=0
            )
            pAj = _crf_apply(vj, _matvec_const(I_ref[j], vj))
            vs.append(vj)
            cs_.append(cj_)
            pA.append(pAj)
            v_par = vj

        # ---- ABA pass 2: articulated inertias ----
        IA = [jnp.broadcast_to(I_ref[j][:, :, None], (6, 6, B)) for j in range(nq)]
        U, dinv, uu = [None] * nq, [None] * nq, [None] * nq
        for j in range(nq - 1, -1, -1):
            Uj = IA[j][:, 2, :]                            # (6, B)
            dj = 1.0 / IA[j][2:3, 2, :]                    # (1, B)
            uj = u[j : j + 1, :] - pA[j][2:3, :]
            U[j], dinv[j], uu[j] = Uj, dj, uj
            if j > 0:
                Ud = Uj * dj                               # (6, B)
                Ia = IA[j] - Uj[:, None, :] * Ud[None, :, :]
                pa = pA[j] + _matvec(Ia, cs_[j]) + Ud * uj
                IA[j - 1] = IA[j - 1] + _matmat_TA(X[j], _matmat(Ia, X[j]))
                pA[j - 1] = pA[j - 1] + _matvec_T(X[j], pa)

        # ---- ABA pass 3: accelerations ----
        if gravity != 0.0:
            row_is5 = (row6 == 5).astype(cand.dtype)
            a_par = row_is5 * gravity
        else:
            a_par = None
        qdd_rows = []
        for j in range(nq):
            ap = cs_[j] if a_par is None else _matvec(X[j], a_par) + cs_[j]
            qdd_j = (uu[j] - _rowsum(U[j] * ap)) * dinv[j]
            qdd_rows.append(qdd_j)
            a_par = ap + ez_mask * qdd_j
        qdd = jnp.concatenate(qdd_rows, axis=0)            # (nq, B)

        # ---- integrator step + defect ----
        if integrator_type == 0:
            qn = q + dt * qd
            qdn = qd + dt * qdd
        else:  # semi-implicit Euler (integrator.cuh:22-57)
            qdn = qd + dt * qdd
            qn = q + dt * qdn
        if angle_wrap:
            # ANGLE_WRAP reflection at +-pi (integrator.cuh:12-19)
            from mpcgpu_tpu.solver.kkt import _WRAP_PI
            qn = jnp.where(qn > _WRAP_PI, -(qn - _WRAP_PI), qn)
            qn = jnp.where(qn < -_WRAP_PI, -(qn + _WRAP_PI), qn)
        xnext = jnp.concatenate([qn, qdn], axis=0)         # (nx, B)
        x_cur = cand[0:nx]
        x_next_cand = pltpu.roll(x_cur, B - 1, axis=1)     # x at lane k+1
        defect = _rowsum(jnp.abs(x_next_cand - xnext))
        defect = defect * not_last                         # no defect at k = N-1

        # ---- tracking cost: FK ee position via homogeneous chain ----
        T = (hc_ref[0][:, :, None]
             + s[0:1, :][None] * hs_ref[0][:, :, None]
             + c[0:1, :][None] * hco_ref[0][:, :, None])   # (4, 4, B)
        for j in range(1, nq):
            Hj = (hc_ref[j][:, :, None]
                  + s[j : j + 1, :][None] * hs_ref[j][:, :, None]
                  + c[j : j + 1, :][None] * hco_ref[j][:, :, None])
            T = _hom_matmat(T, Hj)
        ee = T[0:3, 3, :]                                  # (3, B)
        err = ee - goal_ref[:]                             # (3, B)
        pos_err = _rowsum(err * err)
        qd_pen = qd_cost * _rowsum(qd * qd)
        u_pen = r_cost * _rowsum(u * u) * not_last
        cost = 0.5 * (pos_err + qd_pen + u_pen)            # (1, B)

        out_ref[0:1, :] = cost
        out_ref[1:2, :] = defect

    return kernel


def _hom_matmat(Ta, Tb):
    """(4,4,B) @ (4,4,B)."""
    cols = []
    for l in range(4):
        acc = Ta[:, 0, :] * Tb[0:1, l, :]
        for j in range(1, 4):
            acc = acc + Ta[:, j, :] * Tb[j : j + 1, l, :]
        cols.append(acc)
    return jnp.stack(cols, axis=1)


@highest_precision
@partial(jax.jit, static_argnames=("cost", "num_alphas", "integrator_type",
                                   "include_zero", "interpret", "angle_wrap"))
def line_search_merits_pallas(
    model: RobotModel, cost: CostConfig, xu, dz, xs, ee_goal, mu, dt,
    num_alphas: int = 8, integrator_type: int = 0, include_zero: bool = True,
    interpret: bool = False, angle_wrap: bool = False,
):
    """Drop-in fused replacement for solver.merit.line_search_merits.

    Returns (merits (A,), alphas (A,)) with A = num_alphas (+1 if
    include_zero, prepended as alpha = 0). ee cost mode only.
    """
    if cost.mode != "ee":
        raise ValueError("pallas merit kernel supports ee cost mode only")
    N, w = xu.shape
    nq = model.nq
    nx = 2 * nq
    dtype = xu.dtype

    alphas = -1.0 / (2.0 ** jnp.arange(num_alphas, dtype=dtype))
    if include_zero:
        alphas = jnp.concatenate([jnp.zeros((1,), dtype), alphas])
    A = alphas.shape[0]
    B = A * N

    # candidates, flattened to lanes: cand[c, a*N + k]
    cand = (xu[None, :, :] + alphas[:, None, None] * dz[None, :, :])
    cand_l = cand.reshape(A * N, w).T                      # (w, B)
    goal_l = jnp.broadcast_to(ee_goal[None, :, :3], (A, N, 3)).reshape(B, 3).T

    dt_arr = jnp.asarray([dt], dtype)

    # beyond ~2304 lanes one program exhausts compile resources (N=512 x 9
    # alphas = 4608); split the alpha axis across a Pallas grid — block
    # boundaries fall between alphas, where the defect roll is masked by the
    # k = N-1 term anyway, so per-block evaluation is exact
    ga = A
    while ga > 1 and (ga * N > 2304 or A % ga):
        ga -= 1
    GA = A // ga
    Bl = ga * N

    out = pl.pallas_call(
        _make_merit_kernel(nq, N, ga, integrator_type, float(model.gravity),
                           float(cost.qd_cost), float(cost.r_cost),
                           angle_wrap),
        grid=(GA,),
        out_shape=jax.ShapeDtypeStruct((2, B), dtype),
        in_specs=[
            pl.BlockSpec((w, Bl), lambda g: (0, g)),
            pl.BlockSpec((3, Bl), lambda g: (0, g)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((2, Bl), lambda g: (0, g)),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(cand_l, goal_l, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)

    per_lane = out.reshape(2, A, N)
    cost_tot = jnp.sum(per_lane[0], axis=1)                # (A,)
    defect_tot = jnp.sum(per_lane[1], axis=1)
    # initial-state l1 residual (merit.cuh:69-76), tiny: computed in XLA
    x0_res = jnp.sum(jnp.abs(cand[:, 0, :nx] - xs[None, :]), axis=1)
    merits = cost_tot + mu * (defect_tot + x0_res)
    return merits, alphas


@highest_precision
@partial(jax.jit, static_argnames=("cost", "num_alphas", "integrator_type",
                                   "include_zero", "interpret", "angle_wrap"))
def line_search_merit_partials_slab(
    model: RobotModel, cost: CostConfig, xu_ext, dz_ext, ee_ext, dt,
    num_alphas: int = 8, integrator_type: int = 0, include_zero: bool = True,
    interpret: bool = False, angle_wrap: bool = False,
):
    """Per-lane line-search merit PARTIALS on one knot shard's slab
    (parallel/sqp_sharded.py fused path).

    xu_ext / dz_ext are (Lext, nx+nu) = the shard's L rows plus the right
    neighbor's first row appended (so the local last interior row's defect
    sees the correct next-knot candidate).  Returns (cost (A, Lext),
    defect (A, Lext), alphas (A,)): the caller drops the halo lane, applies
    the global-boundary corrections (terminal control-penalty drop, terminal
    defect zero, initial-state residual), sums, and psums across shards —
    the 8-stream line search of pcg/sqp.cuh:265-282 with its grid-wide
    reduction replaced by one collective.
    """
    if cost.mode != "ee":
        raise ValueError("pallas merit kernel supports ee cost mode only")
    Lext, w = xu_ext.shape
    nq = model.nq
    dtype = xu_ext.dtype

    alphas = -1.0 / (2.0 ** jnp.arange(num_alphas, dtype=dtype))
    if include_zero:
        alphas = jnp.concatenate([jnp.zeros((1,), dtype), alphas])
    A = alphas.shape[0]
    B = A * Lext

    cand = (xu_ext[None, :, :] + alphas[:, None, None] * dz_ext[None, :, :])
    cand_l = cand.reshape(B, w).T                          # (w, B)
    goal_l = jnp.broadcast_to(
        ee_ext[None, :, :3], (A, Lext, 3)).reshape(B, 3).T

    dt_arr = jnp.asarray([dt], dtype)
    ga = A
    while ga > 1 and (ga * Lext > 2304 or A % ga):
        ga -= 1
    GA = A // ga
    Bl = ga * Lext

    out = pl.pallas_call(
        _make_merit_kernel(nq, Lext, ga, integrator_type,
                           float(model.gravity), float(cost.qd_cost),
                           float(cost.r_cost), angle_wrap),
        grid=(GA,),
        out_shape=jax.ShapeDtypeStruct((2, B), dtype),
        in_specs=[
            pl.BlockSpec((w, Bl), lambda g: (0, g)),
            pl.BlockSpec((3, Bl), lambda g: (0, g)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((2, Bl), lambda g: (0, g)),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(cand_l, goal_l, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)

    per_lane = out.reshape(2, A, Lext)
    return per_lane[0], per_lane[1], alphas
