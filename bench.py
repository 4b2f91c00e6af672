#!/usr/bin/env python3
"""Headline benchmark: PCG-SQP iteration latency, IIWA N=64, one TPU chip.

Measures one FULL SQP iteration (KKT assembly -> Schur + stair preconditioner
-> PCG -> dz recovery -> 8-alpha line search -> iterate update) against the
reference's real-time budget of SQP_MAX_TIME_US = 2000 us per control step
(settings.cuh:161-163, BASELINE.md).

Methodology: K control steps of a realistic warm-started MPC chain run INSIDE
one jitted program (`lax.fori_loop`); each step shifts the goal trajectory
and warm start by one knot and advances the initial state, exactly like the
closed-loop tracker's shift logic (mpcsim.cuh:297-347), so every solve does
real work (PCG runs tens of iterations, as in the reference's steady state).
Timing the whole chain and dividing by K measures true per-solve DEVICE
latency; timing individual dispatches would instead measure the host<->device
tunnel round-trip (~26 ms on remote TPU setups), which says nothing about
the solver.

Prints ONE JSON line: value = per-solve latency in microseconds;
vs_baseline = 2000 / value (speedup vs the 2 ms real-time budget; > 1 means
real-time with headroom).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
    from mpcgpu_tpu.solver.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj
    from mpcgpu_tpu.models import iiwa14

    N = 64
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    pcg_cfg = PCGConfig(max_iter=PCGConfig.tuned_max_iter(N), exit_tol=1e-5)
    sqp_cfg = SQPConfig(max_iter=1)

    # full recorded trace: the goal window slides along it each control step
    ee_full = jnp.asarray(load_eepos_traj("0_0"), dtype)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee0 = ee_full[:N]
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    xs = xu[0, :14]
    lam = jnp.zeros((N, 14), dtype)
    rho = jnp.asarray(1e-3, dtype)

    linsys = "pcg_pallas" if jax.default_backend() == "tpu" else "pcg"
    K = 256

    def make_chain(linsys, pcg_cfg):
        @jax.jit
        def chain(xu0, lam0, xs0, ee0, rho0):
            def body(i, carry):
                xu_, lam_, xs_, ee_, rho_, iters = carry
                res = sqp_solve(
                    model, cost, sqp_cfg, pcg_cfg, xu_, lam_, xs_, ee_, rho_,
                    1.0 / 64.0, linsys=linsys,
                )
                # MPC shift (mpcsim.cuh:297-347): advance one knot, backfill
                # the tail, move the goal window along the recorded trace
                xu_n = jnp.roll(res.xu, -1, axis=0).at[-1].set(res.xu[-1])
                lam_n = jnp.roll(res.lam, -1, axis=0).at[-1].set(res.lam[-1])
                xs_n = res.xu[1, :14]
                ee_n = jnp.roll(ee_, -1, axis=0).at[-1].set(
                    jax.lax.dynamic_index_in_dim(
                        ee_full, (i + N) % ee_full.shape[0], keepdims=False
                    )
                )
                return (xu_n, lam_n, xs_n, ee_n, res.rho, iters + res.pcg_iters[0])

            init = (xu0, lam0, xs0, ee0, rho0, jnp.int32(0))
            return jax.lax.fori_loop(0, K, body, init)

        return chain

    def run(linsys, pcg_cfg):
        """(median us/solve over 5 chains, mean pcg iters) or None."""
        fn = make_chain(linsys, pcg_cfg)
        out = fn(xu, lam, xs, ee0, rho)
        jax.block_until_ready(out)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(xu, lam, xs, ee0, rho)
            jax.block_until_ready(out)
            samples.append((time.perf_counter() - t0) * 1e6 / K)
        return float(np.median(samples)), float(np.asarray(out[5])) / K

    import dataclasses

    rnorm_cfg = dataclasses.replace(pcg_cfg, exit_criterion="rnorm")
    try:
        med, iters = run(linsys, rnorm_cfg)
    except Exception:
        linsys = "pcg"
        med, iters = run(linsys, rnorm_cfg)
    eta_med, eta_iters = run(linsys, pcg_cfg)

    # headline = the REFERENCE's exit semantics (||r|| < tol, GBD-PCG /
    # SURVEY.md C17) at the reference tolerance, so the 2 ms budget margin is
    # measured at the reference's accuracy operating point; the eta-exit
    # variant (this framework's cheaper native criterion) is reported
    # alongside (VERDICT r2 items 3/10)
    print(
        json.dumps(
            dict(
                metric="sqp_pcg_iteration_latency_iiwa_n64_rnorm",
                value=round(med, 1),
                unit="us",
                vs_baseline=round(2000.0 / med, 3),
                mean_pcg_iters=round(iters, 1),
                eta_us=round(eta_med, 1),
                eta_mean_pcg_iters=round(eta_iters, 1),
                chain_len=K,
                linsys=linsys,
            )
        )
    )


if __name__ == "__main__":
    main()
