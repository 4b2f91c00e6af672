#!/usr/bin/env python3
"""Per-stage device-compute breakdown of one SQP iteration (IIWA N=64).

Each stage is timed by running a K-iteration ``lax.fori_loop`` INSIDE one
jitted program, with a data-dependency token feeding the stage inputs so XLA
cannot hoist the stage out of the loop.  This removes all host dispatch /
eager-op overhead (large on tunneled TPU setups) and reports pure device
compute per stage.  Run from the repo root on the target backend.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.ops.pcg import pcg_solve
from mpcgpu_tpu.ops.schur import compute_dz, form_schur_system
from mpcgpu_tpu.solver.kkt import build_kkt
from mpcgpu_tpu.solver.merit import line_search_merits, merit_function
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

DT = 1.0 / 64.0


def timeit_looped(name, stage, token0, K=50, reps=3):
    """stage: token -> token. Times K chained applications inside one jit."""

    @jax.jit
    def run(token):
        return jax.lax.fori_loop(0, K, lambda i, t: stage(t), token)

    out = run(token0)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(token0))
        samples.append((time.perf_counter() - t0) * 1e6 / K)
    med = float(np.median(samples))
    print(f"{name:38s} {med:9.1f} us")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, default=64)
    ap.add_argument("--pcg-iters", type=int, default=167)
    ap.add_argument("-K", type=int, default=50)
    args = ap.parse_args()
    N, K = args.knots, args.K

    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    xs = xu[0, :14]
    lam = jnp.zeros((N, 14), dtype)
    rho = jnp.asarray(1e-3, dtype)
    mu = jnp.asarray(10.0, dtype)

    kkt = jax.jit(lambda xu_: build_kkt(model, cost, xu_, xs, ee, DT))(xu)
    schur = jax.jit(lambda k, r: form_schur_system(k, r))(kkt, rho)
    lam_sol = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam,
                        max_iter=args.pcg_iters, exit_tol=1e-5).lam
    dz = compute_dz(kkt, schur, lam_sol)
    jax.block_until_ready(dz)

    timeit_looped(
        "build_kkt",
        lambda t: build_kkt(model, cost, xu + t, xs, ee, DT).q[0, 0] * 0.0,
        jnp.asarray(0.0, dtype), K=K)

    timeit_looped(
        "form_schur_system",
        lambda t: form_schur_system(kkt, rho + t).gamma[0, 0] * 0.0,
        jnp.asarray(0.0, dtype), K=K)

    if jax.default_backend() == "tpu":
        from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas

        t = timeit_looped(
            f"pcg_pallas ({args.pcg_iters} iters forced)",
            lambda tk: pcg_solve_pallas(
                schur.S, schur.Pinv, schur.gamma + tk, lam,
                max_iter=args.pcg_iters, exit_tol=0.0).lam[0, 0] * 0.0,
            jnp.asarray(0.0, dtype), K=K)
        print(f"    -> {t / args.pcg_iters:.2f} us/iter")

    timeit_looped(
        f"pcg while_loop ({args.pcg_iters} iters forced)",
        lambda tk: pcg_solve(
            schur.S, schur.Pinv, schur.gamma + tk, lam,
            max_iter=args.pcg_iters, exit_tol=0.0).lam[0, 0] * 0.0,
        jnp.asarray(0.0, dtype), K=max(K // 5, 5))

    timeit_looped(
        "compute_dz",
        lambda t: compute_dz(kkt, schur, lam_sol + t)[0, 0] * 0.0,
        jnp.asarray(0.0, dtype), K=K)

    timeit_looped(
        "line_search_merits (8 alphas)",
        lambda t: line_search_merits(
            model, cost, xu + t, dz, xs, ee, mu, DT)[0][0] * 0.0,
        jnp.asarray(0.0, dtype), K=K)

    timeit_looped(
        "merit_function (1 point)",
        lambda t: merit_function(
            model, cost, xu + t, xs, ee, mu, DT, include_x0=False) * 0.0,
        jnp.asarray(0.0, dtype), K=K)

    if jax.default_backend() == "tpu":
        # the PRODUCTION fused-kernel stages (what sqp_solve actually runs)
        from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas_lanes
        from mpcgpu_tpu.solver.kkt_pallas import (
            build_kkt_schur_pallas, compute_dz_pallas)
        from mpcgpu_tpu.solver.merit_pallas import line_search_merits_pallas

        # NOTE (axon remote-compile sharp edge): a program whose RESULTS are
        # (foldably) the raw pallas outputs fails to compile — outputs must
        # be consumed by real ops.  Scale by a runtime scalar to stop XLA
        # folding the consumption away.
        @jax.jit
        def _lane_fn(xu_, rho_, t):
            out = build_kkt_schur_pallas(model, cost, xu_, xs, ee, rho_, DT)
            return {k: v * (1.0 + t) for k, v in out.items()}

        lane = _lane_fn(xu, rho, jnp.asarray(0.0, dtype))
        jax.block_until_ready(lane["S"])
        timeit_looped(
            "FUSED kkt+schur+stair kernel",
            lambda t: sum(
                v.sum() for v in build_kkt_schur_pallas(
                    model, cost, xu + t, xs, ee, rho, DT).values()) * 0.0,
            jnp.asarray(0.0, dtype), K=K)
        t = timeit_looped(
            f"FUSED pcg lanes ({args.pcg_iters} iters forced)",
            lambda tk: (lambda r: (r.lam.sum() + r.iters + r.converged) * 0.0)(
                pcg_solve_pallas_lanes(
                    lane["S"], lane["Pinv"], lane["gamma"] + tk, lam.T,
                    max_iter=args.pcg_iters, exit_tol=0.0)),
            jnp.asarray(0.0, dtype), K=K)
        print(f"    -> {t / args.pcg_iters:.2f} us/iter")
        timeit_looped(
            "FUSED dz kernel",
            lambda t: compute_dz_pallas(
                lane, lam_sol + t, xu[:, 14:], rho, cost.r_cost)[0, 0] * 0.0,
            jnp.asarray(0.0, dtype), K=K)
        timeit_looped(
            "FUSED merit kernel (9 candidates)",
            lambda t: line_search_merits_pallas(
                model, cost, xu + t, dz, xs, ee, mu, DT)[0][0] * 0.0,
            jnp.asarray(0.0, dtype), K=K)


if __name__ == "__main__":
    main()
