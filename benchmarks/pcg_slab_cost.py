#!/usr/bin/env python3
"""Per-iteration cost of the slab-kernel sharded PCG vs the fused PCG.

VERDICT r3 item 2's acceptance metric: the slab-step kernel
(ops/pcg_pallas.pcg_slab_step_pallas — one kernel per CG iteration: AXPYs,
u = Pinv r, w = S u, partial dots) should cost within ~2x of the fused
single-chip PCG's per-iteration rate at equal lane count, so the multi-chip
PCG runs kernel economics per shard (it previously ran XLA einsum rates,
~8.6 us/iter vs 1.97 us/iter fused at N=64).

Methodology (bench.py rules): a fixed-iteration (exit_tol=0) solve on a
1-device mesh — collectives compile but are local — chained K times inside
one jitted fori_loop; per-iteration cost = wall / (K * iters).  The fused
single-chip kernel PCG is timed identically for the ratio.

Usage: python benchmarks/pcg_slab_cost.py [--length 64] [--iters 60] [-K 50]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=64,
                    help="slab length L (= N on the 1-device mesh)")
    ap.add_argument("--iters", type=int, default=60,
                    help="fixed CG iteration count per solve")
    ap.add_argument("-K", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--s-steps", type=int, default=4,
                    help="s for the communication-avoiding variants")
    ap.add_argument("--only", nargs="*", default=None,
                    help="variant name prefixes to run (e.g. ca_slab fused)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_sharded
    from mpcgpu_tpu.solver.kkt import build_kkt
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    N = args.length
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu_full = load_xu_traj("0_0")
    reps_needed = int(np.ceil(N / xu_full.shape[0]))
    xu = jnp.asarray(np.tile(xu_full, (reps_needed, 1))[:N], dtype)
    ee = jnp.asarray(np.tile(load_eepos_traj("0_0"), (reps_needed, 1))[:N],
                     dtype)
    kkt = build_kkt(model, cost, xu, xu[0, :14], ee, 1.0 / 64.0)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros_like(schur.gamma)
    mesh = Mesh(np.array(jax.devices()[:1]), ("knot",))

    def make_slab(k):
        def chain(g0):
            def body(i, acc):
                out = pcg_solve_sharded(
                    schur.S, schur.Pinv, g0 + acc * 1e-20, lam0, mesh,
                    max_iter=args.iters, exit_tol=0.0,
                    method="pipelined_slab")
                return acc + out.lam.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain)

    def make_ca(k, method, s_steps):
        def chain(g0):
            def body(i, acc):
                out = pcg_solve_sharded(
                    schur.S, schur.Pinv, g0 + acc * 1e-20, lam0, mesh,
                    max_iter=args.iters, exit_tol=0.0, method=method,
                    s_steps=s_steps)
                return acc + out.lam.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain)

    def make_xla(k):
        def chain(g0):
            def body(i, acc):
                out = pcg_solve_sharded(
                    schur.S, schur.Pinv, g0 + acc * 1e-20, lam0, mesh,
                    max_iter=args.iters, exit_tol=0.0, method="pipelined")
                return acc + out.lam.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain)

    interp = jax.default_backend() != "tpu"

    def make_fused(k):
        def chain(g0):
            def body(i, acc):
                out = pcg_solve_pallas(
                    schur.S, schur.Pinv, g0 + acc * 1e-20, lam0,
                    max_iter=args.iters, exit_tol=0.0, interpret=interp)
                return acc + out.lam.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain)

    # two-K slope per variant: the per-call dispatch constant cancels (it
    # inflates single-K values and biases the slab/fused RATIO toward 1 —
    # round-5 methodology correction, see PARITY.md canonical methodology)
    import functools
    out = {}
    for name, make in (("slab_us_per_iter", make_slab),
                       ("xla_pipelined_us_per_iter", make_xla),
                       ("fused_us_per_iter", make_fused),
                       ("ca_slab_us_per_iter",
                        functools.partial(make_ca, method="ca_slab",
                                          s_steps=args.s_steps)),
                       ("ca_xla_us_per_iter",
                        functools.partial(make_ca, method="ca",
                                          s_steps=args.s_steps))):
        if args.only and not any(name.startswith(p) for p in args.only):
            continue
        fn_lo, fn_hi = make(args.K), make(3 * args.K)
        jax.block_until_ready(fn_lo(schur.gamma))
        jax.block_until_ready(fn_hi(schur.gamma))
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_lo(schur.gamma))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(fn_hi(schur.gamma))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) * 1e6 / (2 * args.K * args.iters))
        out[name] = round(float(np.median(slopes)), 3)

    out.update(metric="pcg_slab_vs_fused_per_iter_us", length=N,
               iters=args.iters, chain_len=[args.K, 3 * args.K],
               timing="two-K slope", s_steps=args.s_steps,
               backend=jax.default_backend())
    if "slab_us_per_iter" in out and "fused_us_per_iter" in out:
        out["ratio"] = round(
            out["slab_us_per_iter"] / out["fused_us_per_iter"], 3)
    if "ca_slab_us_per_iter" in out and "fused_us_per_iter" in out:
        out["ca_ratio"] = round(
            out["ca_slab_us_per_iter"] / out["fused_us_per_iter"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
