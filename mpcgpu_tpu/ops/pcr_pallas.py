"""Fused Pallas parallel-cyclic-reduction kernel: exact BTD solve on-chip.

Lane-packed implementation of ops/pcr.py (see its header for the algorithm):
log2(N) all-lanes elimination levels, each one batched Gauss-Jordan inverse
plus six block products on (n, n, N) tiles, entirely VMEM-resident.  The
per-level factors (th^{-1}, L, U) stay in VMEM, so iterative refinement —
mandatory in f32 on the ill-conditioned Schur systems (ops/pcr.py docstring)
— costs only one BTD matvec plus an RHS-only propagation per pass.

Role: the fast on-chip direct solver (the reference's qdldl slot, C18 —
which ships values to the CPU every SQP iteration, qdldl/sqp.cuh:268-273).
A full SQP iteration with linsys="pcr_pallas" runs ~1.8x faster than the
tuned-cap stair-PCG path at N=64.  Caveat: f32 PCR on these ill-conditioned
Schur systems keeps only a few digits even with refinement (exact in f64);
closed-loop tracking quality is measurably worse than truncated PCG, whose
iteration cap acts as an implicit trust region — use PCG when quality
matters and PCR when latency does.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.precision import highest_precision
from mpcgpu_tpu.solver.kkt_pallas import _gj_inverse_lanes, _mmn, _mvn
from mpcgpu_tpu.ops.pcg_pallas import _matvec_lanes


def _make_pcr_kernel(n: int, N: int, levels: int, refine: int):
    def kernel(S_ref, b_ref, x_ref):
        S = S_ref[:]                                  # (3, n, n, N)
        b0 = b_ref[:]                                 # (n, N)
        dtype = b0.dtype
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, n, N), 2)

        L = jnp.where(lane < 1, 0.0, S[0])
        U = jnp.where(lane > N - 2, 0.0, S[2])
        th = S[1]
        b = b0

        factors = []                                  # (thinv, L, U) per level
        for lvl in range(levels):
            s = 1 << lvl
            thinv = _gj_inverse_lanes(th, n)
            factors.append((thinv, L, U))
            A = _mmn(thinv, L, n)
            B2 = _mmn(thinv, U, n)
            v = _mvn(thinv, b)
            A_m = pltpu.roll(A, s, axis=2)            # value from lane k-s
            B2_m = pltpu.roll(B2, s, axis=2)
            v_m = pltpu.roll(v, s, axis=1)
            A_p = pltpu.roll(A, N - s, axis=2)        # value from lane k+s
            B2_p = pltpu.roll(B2, N - s, axis=2)
            v_p = pltpu.roll(v, N - s, axis=1)
            # L rows with k-s < 0 and U rows with k+s >= N are already zero,
            # so ring-wrapped operands are annihilated; mask the NEW
            # boundaries after the update
            L_new = -_mmn(L, A_m, n)
            U_new = -_mmn(U, B2_p, n)
            th = th - _mmn(L, B2_m, n) - _mmn(U, A_p, n)
            b = b - _mvn(L, v_m) - _mvn(U, v_p)
            L = jnp.where(lane < 2 * s, 0.0, L_new)
            U = jnp.where(lane > N - 1 - 2 * s, 0.0, U_new)

        thinv_f = _gj_inverse_lanes(th, n)
        x = _mvn(thinv_f, b)

        for _ in range(refine):
            r = b0 - _matvec_lanes(S, x)
            for lvl in range(levels):
                s = 1 << lvl
                thinv, L_l, U_l = factors[lvl]
                v = _mvn(thinv, r)
                r = (r - _mvn(L_l, pltpu.roll(v, s, axis=1))
                     - _mvn(U_l, pltpu.roll(v, N - s, axis=1)))
            x = x + _mvn(thinv_f, r)

        x_ref[:] = x

    return kernel


@highest_precision
@partial(jax.jit, static_argnames=("refine", "interpret"))
def pcr_solve_pallas_lanes(S_l, b_l, refine: int = 1, interpret: bool = False):
    """Exact solve of the lane-packed BTD system S x = b.

    S_l: (3, n, n, N) as emitted by solver/kkt_pallas.py; b_l: (n, N).
    Returns x (n, N)."""
    _, n, _, N = S_l.shape
    levels = max(1, math.ceil(math.log2(N))) if N > 1 else 0
    return pl.pallas_call(
        _make_pcr_kernel(n, N, levels, refine),
        out_shape=jax.ShapeDtypeStruct((n, N), b_l.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(S_l, b_l)


@highest_precision
@partial(jax.jit, static_argnames=("refine", "interpret"))
def pcr_solve_pallas(S, b, refine: int = 1, interpret: bool = False):
    """Standard-layout entry: S (N, 3, n, n), b (N, n) -> x (N, n)."""
    S_l = jnp.transpose(S, (1, 2, 3, 0))
    x = pcr_solve_pallas_lanes(S_l, b.T, refine=refine, interpret=interpret)
    return x.T
