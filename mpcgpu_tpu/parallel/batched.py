"""Batched parallel-scenario MPC: vmap over a leading instance axis.

The reference solves one MPC problem at a time; scenario batching (256
instances/chip, BASELINE configs[3]) is a new capability.  One vmap makes the
entire SQP solve — including the PCG while_loop (batched iterations run until
every instance's own exit condition or cap) — a single batched XLA program.

Note on batched PCG semantics: under vmap the while_loop runs until ALL lanes
converge, but each lane stops updating once its own exit fires?  No — vmap of
while_loop lifts the condition to ANY lane still running, and the body keeps
updating every lane.  For exact per-lane exit semantics (iteration counts per
instance) we mask updates once a lane has converged; see ``pcg_solve``'s use
inside the solver: iters/converged are reported per lane correctly because
eta-based exit is monotone under continued iteration.  For performance this
is the right trade on TPU: lanes are SIMD-batched either way.
"""

from __future__ import annotations

import jax

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.solver.sqp import sqp_solve


def make_batched_sqp_solver(
    model: RobotModel,
    cost: CostConfig,
    sqp_cfg: SQPConfig,
    pcg_cfg: PCGConfig,
    dt: float,
    linsys: str = "pcg",
    donate: bool = True,
    fused: bool | str = "auto",
):
    """fn(xu (B,N,nx+nu), lam (B,N,nx), xs (B,nx), ee_goal (B,N,6), rho (B,))
    -> batched SQPResult.

    fused="auto"/True selects the instance-GRIDDED fused kernel pipeline
    (parallel/batched_fused.py: instances packed on lanes, Pallas grid over
    instance groups, HBM-resident inter-kernel buffers) when applicable —
    on TPU, ee cost, stair preconditioner, N <= 128 lanes per instance.
    fused=False is the vmapped unfused path: only the fully-fused
    INTER-kernel chain is disabled there (its inter-kernel buffers get
    VMEM-pinned by XLA and a large batch exceeds the 16 MB scoped budget);
    the individual kernels still run vmapped where their lane gates allow
    (solver/sqp.py:94-100)."""
    def _make_unfused():
        def _solve_one(xu, lam, xs, ee_goal, rho):
            return sqp_solve(
                model, cost, sqp_cfg, pcg_cfg, xu, lam, xs, ee_goal, rho, dt,
                linsys=linsys, fused=False,
            )

        batched = jax.vmap(_solve_one)
        donate_argnums = (0, 1) if donate else ()
        return jax.jit(batched, donate_argnums=donate_argnums)

    def _make_fused():
        from mpcgpu_tpu.parallel.batched_fused import make_batched_fused_solver

        return make_batched_fused_solver(
            model, cost, sqp_cfg, pcg_cfg, dt, donate=donate)

    if fused == "auto":
        applicable = (jax.default_backend() == "tpu" and cost.mode == "ee"
                      and pcg_cfg.preconditioner == "stair"
                      and linsys in ("pcg", "pcg_pallas"))
        if not applicable:
            return _make_unfused()
        # the fused pipeline's N <= 512 lane gate is only checkable at call
        # time (N comes from xu's shape): dispatch per shape, falling back to
        # the vmapped unfused path for longer horizons instead of raising
        solvers: dict = {}

        def _dispatch(xu_b, lam_b, xs_b, ee_goal_b, rho_b):
            key = "fused" if xu_b.shape[1] <= 512 else "unfused"
            if key not in solvers:
                solvers[key] = _make_fused() if key == "fused" else _make_unfused()
            return solvers[key](xu_b, lam_b, xs_b, ee_goal_b, rho_b)

        return _dispatch
    if fused:
        return _make_fused()
    return _make_unfused()
