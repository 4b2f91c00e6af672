"""Fused Pallas plant-rollout kernel: a whole control period in one kernel.

Equivalent of simple_simulate (include/common/integrator.cuh:295-325), which
launches one CUDA kernel per 2e-4 s substep; the XLA scan equivalent
(sim/mpc.py::_simulate_plant) pays the tiny-op floor per substep (~0.4 ms for
single-sample forward dynamics). Here the full substep loop runs VMEM-
resident: articulated-body forward dynamics (same recursion as
models/dynamics.py::forward_dynamics_aba and the merit kernel), explicit
Euler update, and control selection from the plan by elapsed time (a one-hot
lane reduction — the knot axis of the plan sits on lanes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.precision import highest_precision
from mpcgpu_tpu.solver.merit_pallas import (_crf_apply, _matmat,
                                             _matmat_TA, _matvec, _matvec_T,
                                             _rowsum)


def _make_plant_kernel(nq: int, N: int, n_steps: int, gravity: float):
    def kernel(xs_ref, plan_ref, scal_ref,
               xc_ref, xsin_ref, xcos_ref, I_ref, out_ref):
        t_off = scal_ref[0]
        timestep = scal_ref[1]
        sim_step = scal_ref[2]
        sim_time = scal_ref[3]
        xs = xs_ref[:]                              # (2nq, 1)
        plan_u = plan_ref[:]                        # (nq, N) controls per knot
        dtype = xs.dtype
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        row6 = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
        ez = (row6 == 2).astype(dtype)

        def aba(q, qd, u):
            """(7,1) single-sample ABA; mirrors merit_pallas's batched pass."""
            s = jnp.sin(q)
            c = jnp.cos(q)
            X = []
            for j in range(nq):
                sj = s[j : j + 1, :][None]
                cj = c[j : j + 1, :][None]
                X.append(xc_ref[j][:, :, None] + sj * xsin_ref[j][:, :, None]
                         + cj * xcos_ref[j][:, :, None])
            v_par = None
            cs_, pA = [], []
            for j in range(nq):
                qdj = qd[j : j + 1, :]
                if v_par is None:
                    vj = ez * qdj
                else:
                    vj = _matvec(X[j], v_par) + ez * qdj
                zero1 = jnp.zeros_like(qdj)
                cj_ = qdj * jnp.concatenate(
                    [vj[1:2], -vj[0:1], zero1, vj[4:5], -vj[3:4], zero1], axis=0)
                Ij = I_ref[j][:, :, None]
                Ivj = (Ij[:, 0, :] * vj[0:1] + Ij[:, 1, :] * vj[1:2]
                       + Ij[:, 2, :] * vj[2:3] + Ij[:, 3, :] * vj[3:4]
                       + Ij[:, 4, :] * vj[4:5] + Ij[:, 5, :] * vj[5:6])
                pA.append(_crf_apply(vj, Ivj))
                cs_.append(cj_)
                v_par = vj
            IA = [jnp.broadcast_to(I_ref[j][:, :, None], (6, 6, 1))
                  for j in range(nq)]
            U, dinv, uu = [None] * nq, [None] * nq, [None] * nq
            for j in range(nq - 1, -1, -1):
                Uj = IA[j][:, 2, :]
                dj = 1.0 / IA[j][2:3, 2, :]
                uj = u[j : j + 1, :] - pA[j][2:3, :]
                U[j], dinv[j], uu[j] = Uj, dj, uj
                if j > 0:
                    Ud = Uj * dj
                    Ia = IA[j] - Uj[:, None, :] * Ud[None, :, :]
                    pa = pA[j] + _matvec(Ia, cs_[j]) + Ud * uj
                    IA[j - 1] = IA[j - 1] + _matmat_TA(X[j], _matmat(Ia, X[j]))
                    pA[j - 1] = pA[j - 1] + _matvec_T(X[j], pa)
            if gravity != 0.0:
                a_par = (row6 == 5).astype(dtype) * gravity
            else:
                a_par = None
            qdd_rows = []
            for j in range(nq):
                ap = cs_[j] if a_par is None else _matvec(X[j], a_par) + cs_[j]
                qdd_j = (uu[j] - _rowsum(U[j] * ap)) * dinv[j]
                qdd_rows.append(qdd_j)
                a_par = ap + ez * qdd_j
            return jnp.concatenate(qdd_rows, axis=0)

        def sub(i, st):
            q, qd = st
            off = sim_step * i.astype(dtype)
            t = t_off + off
            idx = jnp.minimum((t / timestep).astype(jnp.int32), N - 1)
            sel = (lane == idx).astype(dtype)               # (1, N) one-hot
            u = jnp.sum(plan_u * sel, axis=1, keepdims=True)  # (nq, 1)
            qdd = aba(q, qd, u)
            # clip schedule: sums to exactly sim_time (see _simulate_plant)
            dt = jnp.clip(sim_time - off, 0.0, sim_step)
            return (q + dt * qd, qd + dt * qdd)

        q, qd = jax.lax.fori_loop(
            0, n_steps + 1, sub, (xs[0:nq], xs[nq : 2 * nq]))
        out_ref[:] = jnp.concatenate([q, qd], axis=0)

    return kernel



@highest_precision
@partial(jax.jit, static_argnames=("n_steps", "sim_step", "interpret"))
def simulate_plant_pallas(model: RobotModel, xs, xu_plan, time_offset_s,
                          sim_time_s, timestep, n_steps: int, sim_step: float,
                          interpret: bool = False):
    """Drop-in fused replacement for sim/mpc.py::_simulate_plant."""
    nq = model.nq
    N = xu_plan.shape[0]
    dtype = xs.dtype
    scal = jnp.stack([
        jnp.asarray(time_offset_s, dtype), jnp.asarray(timestep, dtype),
        jnp.asarray(sim_step, dtype), jnp.asarray(sim_time_s, dtype),
    ])
    out = pl.pallas_call(
        _make_plant_kernel(nq, N, n_steps, float(model.gravity)),
        out_shape=jax.ShapeDtypeStruct((2 * nq, 1), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(xs[:, None], xu_plan[:, 2 * nq :].T, scal,
      model.xc, model.xs, model.xcos, model.inertia)
    return out[:, 0]
