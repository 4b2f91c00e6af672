#!/usr/bin/env python3
"""MXU-vs-VPU experiment at the weak regimes (VERDICT round 1, item 9).

Every production kernel in this repo is VPU lane-FMA on (block, lane) tiles
— defensible for 14-wide blocks at N <= 128, but unmeasured at N >= 256 /
B >= 256.  This script measures three layouts of the two candidate ops:

1. Batched BTD SpMV (the PCG inner product of work):
   a. "lanes"  — the packed-lane formulation the Pallas kernels use
                 (instances/knots on lanes, j-contraction unrolled on VPU);
   b. "vmap"   — vmapped einsum('kij,kj->ki') (XLA batched matvec);
   c. "mxu"    — instances as COLUMNS: einsum('kij,kjb->kib'), i.e. one
                 (nx, nx) @ (nx, B) matmul per knot — real MXU shape when
                 B >= 128.
2. Batched SPD block inverse (Schur formation):
   a. "gj"     — ops/smallmat.py unrolled Gauss-Jordan (VPU);
   b. "lu"     — jnp.linalg.inv (XLA LU path).

Timing: K applications chained in one jitted fori_loop (bench.py
methodology).  Prints one JSON line per (op, layout, config); paste the
conclusion into PARITY.md.
"""

import argparse
import json
import time

import numpy as np


def chain_time(stage, K, reps=3):
    import jax
    import jax.numpy as jnp

    tiny = jnp.asarray(1e-37, jnp.float32)

    @jax.jit
    def run(t):
        return jax.lax.fori_loop(0, K, lambda i, tt: stage(tt * tiny), t)

    t0 = jnp.asarray(1.0, jnp.float32)
    jax.block_until_ready(run(t0))
    samples = []
    for _ in range(reps):
        s = time.perf_counter()
        jax.block_until_ready(run(t0))
        samples.append((time.perf_counter() - s) / K)
    return float(np.median(samples))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.ops.smallmat import gj_inverse
    from mpcgpu_tpu.precision import highest_precision

    rng = np.random.default_rng(0)
    results = []

    def emit(**kw):
        results.append(kw)
        print(json.dumps(kw))

    for (N, B) in [(32, 256), (256, 64), (512, 16)]:
        n = 28
        S_np = rng.standard_normal((N, 3, n, n)).astype(np.float32)
        X_np = rng.standard_normal((B, N, n)).astype(np.float32)
        S = jnp.asarray(S_np)
        Xb = jnp.asarray(X_np)                       # (B, N, n)
        Xc = jnp.asarray(np.transpose(X_np, (1, 2, 0)))   # (N, n, B) columns

        @highest_precision
        def spmv_vmap(t):
            x = Xb + t
            y = (jnp.einsum("kij,bkj->bki", S[:, 1], x)
                 + jnp.einsum("kij,bkj->bki", S[:, 0],
                              jnp.roll(x, 1, axis=1))
                 + jnp.einsum("kij,bkj->bki", S[:, 2],
                              jnp.roll(x, -1, axis=1)))
            return jnp.sum(y) * 0.0 + t + jnp.max(y) * 1e-30

        @highest_precision
        def spmv_mxu(t):
            x = Xc + t                                # (N, n, B)
            y = (jnp.einsum("kij,kjb->kib", S[:, 1], x)
                 + jnp.einsum("kij,kjb->kib", S[:, 0],
                              jnp.roll(x, 1, axis=0))
                 + jnp.einsum("kij,kjb->kib", S[:, 2],
                              jnp.roll(x, -1, axis=0)))
            return jnp.sum(y) * 0.0 + t + jnp.max(y) * 1e-30

        for name, fn in [("vmap_matvec", spmv_vmap), ("mxu_columns", spmv_mxu)]:
            dt = chain_time(fn, K=100, reps=args.reps)
            flops = 2 * 3 * N * n * n * B
            emit(op="btd_spmv", layout=name, knots=N, batch=B,
                 us=round(dt * 1e6, 1),
                 gflops=round(flops / dt / 1e9, 1))

        # lane-packed Pallas SpMV (same data, knots*instances on lanes) —
        # only where the packed kernel applies (N*inst <= 512 lanes/program)
        if jax.default_backend() == "tpu" and N <= 128:
            from functools import partial

            import jax.experimental.pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from mpcgpu_tpu.ops.pcg_pallas import _matvec_lanes

            I = max(1, 128 // N)
            G = B // I
            L = I * N
            S_l = jnp.asarray(
                np.broadcast_to(
                    np.transpose(S_np, (1, 2, 3, 0))[None],
                    (G, 3, n, n, N)))
            S_L = jnp.tile(S_l, (1, 1, 1, 1, I))      # (G,3,n,n,L)
            X_l = jnp.asarray(
                X_np.reshape(G, I, N, n).transpose(0, 3, 1, 2).reshape(G, n, L))

            def lane_kernel(x_ref, s_ref, o_ref):
                o_ref[0] = _matvec_lanes(s_ref[0], x_ref[0])

            @jax.jit
            def spmv_lanes(t):
                y = pl.pallas_call(
                    lane_kernel,
                    grid=(G,),
                    out_shape=jax.ShapeDtypeStruct((G, n, L), jnp.float32),
                    in_specs=[
                        pl.BlockSpec((1, n, L), lambda g: (g, 0, 0)),
                        pl.BlockSpec((1, 3, n, n, L), lambda g: (g, 0, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, n, L), lambda g: (g, 0, 0)),
                )(X_l + t, S_L)
                return jnp.sum(y) * 0.0 + t + jnp.max(y) * 1e-30

            dt = chain_time(spmv_lanes, K=100, reps=args.reps)
            flops = 2 * 3 * N * n * n * B
            emit(op="btd_spmv", layout="pallas_lanes", knots=N, batch=B,
                 us=round(dt * 1e6, 1), gflops=round(flops / dt / 1e9, 1))

    # batched SPD inverse
    for nblocks in [256 * 32, 512]:
        n = 28
        A_np = rng.standard_normal((nblocks, n, n)).astype(np.float32)
        M_np = np.einsum("bij,bkj->bik", A_np, A_np) + 5 * np.eye(n, dtype=np.float32)
        M = jnp.asarray(M_np)

        @highest_precision
        def inv_gj(t):
            out = gj_inverse(M + t * jnp.eye(n, dtype=jnp.float32))
            return jnp.sum(out) * 0.0 + t + jnp.max(out) * 1e-30

        @highest_precision
        def inv_lu(t):
            out = jnp.linalg.inv(M + t * jnp.eye(n, dtype=jnp.float32))
            return jnp.sum(out) * 0.0 + t + jnp.max(out) * 1e-30

        for name, fn in [("gauss_jordan_vpu", inv_gj), ("linalg_inv_lu", inv_lu)]:
            dt = chain_time(fn, K=50, reps=args.reps)
            emit(op="spd_inverse_28", layout=name, blocks=nblocks,
                 us=round(dt * 1e6, 1),
                 inv_per_s=round(nblocks / dt))

    print(json.dumps(dict(metric="mxu_experiment",
                          backend=jax.default_backend(), table=results)))


if __name__ == "__main__":
    main()
