"""Knot-sharded PCG: the BTD Schur system row-partitioned across devices.

The horizon axis is the reference's defining parallel axis (one CUDA block
per knot, SURVEY.md section 2); across chips it becomes sequence parallelism:
each device owns a contiguous slab of knot block-rows.  Per PCG iteration the
BTD SpMV and the stair preconditioner apply need only each neighbor's single
boundary block-vector row — O(1) communication via a `ppermute` ring over ICI
— and the two CG dot products reduce with `psum` (BASELINE configs[4],
SURVEY.md section 5 "long-context/sequence parallelism").

Implementation: `shard_map` over the ``knot`` mesh axis; the while_loop runs
identically on every device (replicated scalars), so the whole solve is one
SPMD program with two ppermutes + two psums per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mpcgpu_tpu.ops.pcg import PCGResult
from mpcgpu_tpu.precision import highest_precision


def _halo_rows(x_loc, axis_name: str):
    """Exchange boundary rows with ring neighbors.

    Returns (from_left (n,), from_right (n,)): the left neighbor's LAST row
    and the right neighbor's FIRST row.  Ring wraparound rows are multiplied
    by the (structurally zero) corner blocks S[0,0] / S[N-1,2], so no masking
    is needed.
    """
    n_dev = jax.lax.axis_size(axis_name)
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]   # send to right
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]   # send to left
    from_left = jax.lax.ppermute(x_loc[-1], axis_name, perm_fwd)
    from_right = jax.lax.ppermute(x_loc[0], axis_name, perm_bwd)
    return from_left, from_right


def btd_matvec_halo(S_loc, x_loc, axis_name: str):
    """Local slab of y = S @ x with halo exchange (overlappable with the
    interior diag/off-diag compute by XLA's latency-hiding scheduler)."""
    from_left, from_right = _halo_rows(x_loc, axis_name)
    x_prev = jnp.concatenate([from_left[None], x_loc[:-1]], axis=0)
    x_next = jnp.concatenate([x_loc[1:], from_right[None]], axis=0)
    return (
        jnp.einsum("kij,kj->ki", S_loc[:, 1], x_loc)
        + jnp.einsum("kij,kj->ki", S_loc[:, 0], x_prev)
        + jnp.einsum("kij,kj->ki", S_loc[:, 2], x_next)
    )


def _pdot(a, b, axis_name: str):
    return jax.lax.psum(jnp.vdot(a, b), axis_name)


def _pcg_local(S_loc, Pinv_loc, gamma_loc, lam_loc, max_iter: int, exit_tol,
               axis_name: str, exit_criterion: str = "eta"):
    matvec = lambda M, x: btd_matvec_halo(M, x, axis_name)
    dot = lambda a, b: _pdot(a, b, axis_name)
    dtype = gamma_loc.dtype
    exit_tol = jnp.asarray(exit_tol, dtype)

    def exit_test(r, eta):
        # "rnorm" = the reference/GBD-PCG ||r|| < tol (SURVEY.md C17);
        # the extra psum'd dot rides the same latency window as eta's.
        if exit_criterion == "rnorm":
            return dot(r, r) < exit_tol * exit_tol
        return jnp.abs(eta) < exit_tol

    r0 = gamma_loc - matvec(S_loc, lam_loc)
    z0 = matvec(Pinv_loc, r0)
    eta0 = dot(r0, z0)

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        lam, r, p, eta, it, _ = state
        Sp = matvec(S_loc, p)
        alpha = eta / dot(p, Sp)
        lam = lam + alpha * p
        r = r - alpha * Sp
        z = matvec(Pinv_loc, r)
        eta_new = dot(r, z)
        done = exit_test(r, eta_new)
        p = z + (eta_new / eta) * p
        return (lam, r, p, eta_new, it + 1, done)

    init = (lam_loc, r0, z0, eta0, jnp.int32(0), exit_test(r0, eta0))
    lam, _, _, _, iters, done = jax.lax.while_loop(cond, body, init)
    return lam, iters, done


@highest_precision
def pcg_solve_sharded(
    S, Pinv, gamma, lam0, mesh: Mesh, max_iter: int = 173, exit_tol=1e-6,
    knot_axis: str = "knot", exit_criterion: str = "eta",
) -> PCGResult:
    """Solve S lam = gamma with knot blocks sharded over ``mesh[knot_axis]``.

    Shapes as in ops/pcg.py; N must be divisible by the knot axis size.
    """
    fn = shard_map(
        partial(_pcg_local, max_iter=max_iter, exit_tol=exit_tol,
                axis_name=knot_axis, exit_criterion=exit_criterion),
        mesh=mesh,
        in_specs=(P(knot_axis), P(knot_axis), P(knot_axis), P(knot_axis)),
        out_specs=(P(knot_axis), P(), P()),
    )
    lam, iters, done = fn(S, Pinv, gamma, lam0)
    return PCGResult(lam=lam, iters=iters, converged=done)
