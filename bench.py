#!/usr/bin/env python3
"""Headline benchmark: PCG-SQP iteration latency, IIWA N=64, one TPU chip.

Measures one FULL SQP iteration (KKT assembly -> Schur + stair preconditioner
-> PCG at the tuned iteration cap -> dz recovery -> 8-alpha line search ->
iterate update) as one jitted program, end to end including dispatch — the
reference's real-time budget for this is SQP_MAX_TIME_US = 2000 us per
control step (settings.cuh:161-163, BASELINE.md).

Prints ONE JSON line: value = median latency in microseconds;
vs_baseline = 2000 / value (speedup vs the 2 ms real-time budget; > 1 means
real-time with headroom).
"""

import json
import time

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

    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    xs = xu[0, :14]
    lam = jnp.zeros((N, 14), dtype)

    def make_fn(linsys):
        return jax.jit(
            lambda xu_, lam_, rho_: sqp_solve(
                model, cost, sqp_cfg, pcg_cfg, xu_, lam_, xs, ee, rho_, 1.0 / 64.0,
                linsys=linsys,
            )
        )

    rho = jnp.asarray(1e-3, dtype)

    # fused Pallas PCG on TPU; fall back to the while_loop solver elsewhere
    try:
        fn = make_fn("pcg_pallas" if jax.default_backend() == "tpu" else "pcg")
        res = fn(xu, lam, rho)
        jax.block_until_ready(res.xu)
    except Exception:
        fn = make_fn("pcg")

    # warm-up / compile (REMOVE_JITTERS analogue, mpcsim.cuh:222-242)
    for _ in range(3):
        res = fn(xu, lam, rho)
        jax.block_until_ready(res.xu)

    # Chain K solves with a data dependency (each consumes a token from the
    # previous result) and block once: measures true per-solve DEVICE latency,
    # excluding host<->device round-trip overhead (which on tunneled/remote
    # TPU setups is tens of ms and says nothing about the solver).  The
    # dependency chain prevents cross-solve pipelining.
    K = 50
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = fn(xu, lam, rho)
        for _ in range(K - 1):
            token = 0.0 * res.merit
            res = fn(xu + token, lam + token, rho + token)
        jax.block_until_ready(res.xu)
        samples.append((time.perf_counter() - t0) * 1e6 / K)
    med = float(np.median(samples))

    print(
        json.dumps(
            dict(
                metric="sqp_pcg_iteration_latency_iiwa_n64",
                value=round(med, 1),
                unit="us",
                vs_baseline=round(2000.0 / med, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
