#!/usr/bin/env python3
"""Slab-kernel cost vs the full-horizon fused kernel at equal length.

VERDICT r2 item 1's acceptance metric for the fused multi-chip path: the
shard-local slab variant of the KKT+Schur+stair kernel (2-knot halos each
side, runtime boundary masks) should cost within ~1.5x of the full fused
kernel at the same lane count — then the knot-sharded SQP keeps single-chip
kernel economics per shard.

Times a K-step chain of each kernel (one jitted fori_loop, outputs consumed
by a reduction so nothing folds away), medians over reps.

Usage: python benchmarks/slab_cost.py [--length 64] [-K 200]
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
                    help="slab length L; full kernel runs at N = L, slab at "
                    "Lext = L + 4 halo lanes")
    ap.add_argument("-K", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.solver.kkt_pallas import (build_kkt_schur_pallas,
                                              build_kkt_schur_pallas_slab)
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    L = args.length
    H = 2
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(L)
    interp = jax.default_backend() != "tpu"
    xu_full = load_xu_traj("0_0")
    reps_needed = int(np.ceil((L + 2 * H) / xu_full.shape[0]))
    xu_ext = jnp.asarray(np.tile(xu_full, (reps_needed, 1))[: L + 2 * H], dtype)
    ee_ext = jnp.asarray(np.tile(load_eepos_traj("0_0"),
                                 (reps_needed, 1))[: L + 2 * H], dtype)
    xu = xu_ext[H: H + L]
    ee = ee_ext[H: H + L]
    rho = jnp.float32(1e-3)
    dt = 1.0 / 64.0
    # interior-shard masks: no global boundary on this slab
    zmask = jnp.zeros((L + 2 * H,), dtype)

    def make_full(k):
        def chain_full(xu0):
            def body(i, acc):
                lane = build_kkt_schur_pallas(
                    model, cost, xu0 + acc * 1e-20, xu0[0, :14], ee, rho, dt,
                    interpret=interp)
                return acc + lane["gamma"].sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain_full)

    def make_slab(k):
        def chain_slab(xu0):
            def body(i, acc):
                lane = build_kkt_schur_pallas_slab(
                    model, cost, xu0 + acc * 1e-20, xu0[:, :14], ee_ext,
                    zmask, zmask, rho, dt, interpret=interp)
                return acc + lane["gamma"].sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(chain_slab)

    # two-K slope: the per-call dispatch constant cancels (it inflates both
    # single-K values and biases the RATIO toward 1 — round-5 methodology
    # correction, see PARITY.md canonical methodology)
    out = {}
    for name, make, arg in (("full", make_full, xu),
                            ("slab", make_slab, xu_ext)):
        fn_lo, fn_hi = make(args.K), make(3 * args.K)
        jax.block_until_ready(fn_lo(arg))
        jax.block_until_ready(fn_hi(arg))
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_lo(arg))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(fn_hi(arg))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) * 1e6 / (2 * args.K))
        out[name] = round(float(np.median(slopes)), 2)

    out.update(metric="slab_vs_full_kkt_schur_kernel_us", length=L,
               halo=H, ratio=round(out["slab"] / out["full"], 3),
               backend=jax.default_backend(), chain_len=[args.K, 3 * args.K],
               timing="two-K slope")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
