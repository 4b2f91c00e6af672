#!/usr/bin/env python3
"""Benchmark harness covering the BASELINE.json config matrix.

Configs (BASELINE.json "configs"):
  1. direct LDL^T SQP solve, IIWA N=16 (qdldl-equivalent baseline)
  2. PCG with Jacobi (block-diagonal) preconditioner, N=32, single chip
  3. full symmetric-stair PCG + SQP line search, N=64 (the headline; bench.py)
  4. batched parallel-scenario MPC: 256 instances/chip, batched PCG
  5. long-horizon N=512 knot-sharded PCG (ppermute halos) — on a real
     multi-chip mesh when available, else measured single-device

Prints one JSON line per config; also reports PCG nnz/s throughput
(nnz of the BTD Schur matrix = 3*N*nx^2 - 2*nx^2 processed per PCG iteration).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.ops.pcg import pcg_solve
from mpcgpu_tpu.ops.schur import form_schur_system
from mpcgpu_tpu.parallel.batched import make_batched_sqp_solver
from mpcgpu_tpu.parallel.mesh import make_mesh
from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_sharded
from mpcgpu_tpu.solver.kkt import build_kkt
from mpcgpu_tpu.solver.sqp import sqp_solve
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

NX = 14
DT = 1.0 / 64.0


def _problem(N, B=None, dtype=jnp.float32, seed=0):
    model = iiwa14(dtype=dtype)
    reps = (N + 665) // 666
    xu_np = np.concatenate([np.asarray(load_xu_traj("0_0"))] * reps)[:N]
    ee_np = np.concatenate([np.asarray(load_eepos_traj("0_0"))] * reps)[:N]
    xu = jnp.asarray(xu_np, dtype)
    ee = jnp.asarray(ee_np, dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(seed), xu.shape, dtype)
    xs = xu[0, :NX]
    lam = jnp.zeros((N, NX), dtype)
    if B is not None:
        xu = jnp.broadcast_to(xu, (B,) + xu.shape)
        ee = jnp.broadcast_to(ee, (B,) + ee.shape)
        xs = jnp.broadcast_to(xs, (B,) + xs.shape)
        lam = jnp.zeros((B, N, NX), dtype)
    return model, xu, lam, xs, ee


def _time(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def emit(**kw):
    print(json.dumps(kw))


def cfg1_direct_n16():
    N = 16
    model, xu, lam, xs, ee = _problem(N)
    cost = CostConfig.for_knots(N)
    fn = jax.jit(
        lambda xu_, lam_: sqp_solve(
            model, cost, SQPConfig(max_iter=1), PCGConfig(), xu_, lam_, xs, ee,
            1e-3, DT, linsys="ldl",
        )
    )
    dt_s, _ = _time(fn, xu, lam)
    emit(metric="direct_ldl_sqp_iteration_n16", value=round(dt_s * 1e6, 1), unit="us")


def cfg2_jacobi_n32():
    N = 32
    model, xu, lam, xs, ee = _problem(N)
    cost = CostConfig.for_knots(N)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3, preconditioner="jacobi")
    fn = jax.jit(
        lambda S, P, g, l: pcg_solve(S, P, g, l, max_iter=500, exit_tol=1e-6)
    )
    dt_s, out = _time(fn, schur.S, schur.Pinv, schur.gamma, lam)
    nnz = 3 * N * NX * NX - 2 * NX * NX
    iters = int(out.iters)
    emit(
        metric="pcg_jacobi_solve_n32", value=round(dt_s * 1e6, 1), unit="us",
        iters=iters, nnz_per_s=round(nnz * iters / dt_s),
    )


def cfg3_stair_n64():
    N = 64
    model, xu, lam, xs, ee = _problem(N)
    cost = CostConfig.for_knots(N)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3, preconditioner="stair")
    linsys = "pcg"
    if jax.default_backend() == "tpu":
        from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas

        fn = jax.jit(
            lambda S, P, g, l: pcg_solve_pallas(S, P, g, l, max_iter=167, exit_tol=1e-5)
        )
    else:
        fn = jax.jit(
            lambda S, P, g, l: pcg_solve(S, P, g, l, max_iter=167, exit_tol=1e-5)
        )
    dt_s, out = _time(fn, schur.S, schur.Pinv, schur.gamma, lam)
    nnz = 3 * N * NX * NX - 2 * NX * NX
    iters = max(int(out.iters), 1)
    emit(
        metric="pcg_stair_solve_n64", value=round(dt_s * 1e6, 1), unit="us",
        iters=iters, nnz_per_s=round(nnz * iters / dt_s),
    )

    sqp_fn = jax.jit(
        lambda xu_, lam_: sqp_solve(
            model, cost, SQPConfig(max_iter=1),
            PCGConfig(max_iter=167, exit_tol=1e-5),
            xu_, lam_, xs, ee, 1e-3, DT,
            linsys="pcg_pallas" if jax.default_backend() == "tpu" else "pcg",
        )
    )
    dt_s, _ = _time(sqp_fn, xu, lam)
    emit(
        metric="sqp_pcg_iteration_n64", value=round(dt_s * 1e6, 1), unit="us",
        vs_2ms_budget=round(2000.0 / (dt_s * 1e6), 3),
    )


def cfg4_batched(B=256):
    N = 32
    model, xu, lam, xs, ee = _problem(N, B=B)
    cost = CostConfig.for_knots(N)
    solver = make_batched_sqp_solver(
        model, cost, SQPConfig(max_iter=1), PCGConfig(max_iter=173, exit_tol=1e-5),
        DT, donate=False,
    )
    rho = jnp.full((B,), 1e-3, jnp.float32)
    dt_s, _ = _time(solver, xu, lam, xs, ee, rho, reps=5)
    emit(
        metric=f"batched_sqp_iteration_n32_b{B}", value=round(dt_s * 1e6, 1),
        unit="us", solves_per_s=round(B / dt_s),
    )


def cfg5_long_horizon(N=512):
    n_dev = len(jax.devices())
    model, xu, lam, xs, ee = _problem(N)
    cost = CostConfig.for_knots(N)
    kkt = build_kkt(model, cost, xu, xs, ee, DT)
    schur = form_schur_system(kkt, 1e-3)
    nnz = 3 * N * NX * NX - 2 * NX * NX
    if n_dev > 1:
        mesh = make_mesh(1, n_dev)
        fn = jax.jit(
            lambda S, P, g, l: pcg_solve_sharded(S, P, g, l, mesh, max_iter=67, exit_tol=1e-5)
        )
    else:
        fn = jax.jit(
            lambda S, P, g, l: pcg_solve(S, P, g, l, max_iter=67, exit_tol=1e-5)
        )
    dt_s, out = _time(fn, schur.S, schur.Pinv, schur.gamma, lam)
    iters = max(int(out.iters), 1)
    emit(
        metric=f"pcg_long_horizon_n{N}_dev{n_dev}", value=round(dt_s * 1e6, 1),
        unit="us", iters=iters, nnz_per_s=round(nnz * iters / dt_s), devices=n_dev,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument(
        "--configs", nargs="*", type=int, default=[1, 2, 3, 4, 5],
        help="which BASELINE configs to run",
    )
    args = ap.parse_args()
    emit(backend=jax.default_backend(), devices=len(jax.devices()))
    if 1 in args.configs:
        cfg1_direct_n16()
    if 2 in args.configs:
        cfg2_jacobi_n32()
    if 3 in args.configs:
        cfg3_stair_n64()
    if 4 in args.configs:
        cfg4_batched(args.batch)
    if 5 in args.configs:
        cfg5_long_horizon()


if __name__ == "__main__":
    main()
