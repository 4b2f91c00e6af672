"""Symmetric block-tridiagonal (BTD) matrix storage and ops.

Storage mirrors the reference's 3-slot block rows (pcg/linsys_setup.cuh:16-18,
load/store_block_bd): ``S`` has shape (N, 3, n, n) where

  S[k, 0] = block (k, k-1)   (zero for k = 0)
  S[k, 1] = block (k, k)
  S[k, 2] = block (k, k+1)   (zero for k = N-1)

All ops batch over arbitrary leading axes via vmap at call sites.
"""

from __future__ import annotations

import jax.numpy as jnp


def btd_matvec(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = S @ x for block-banded S (N,2b+1,n,n) and block vector x (N,n).

    Slot b+d of row k holds block (k, k+d); the common case is the BTD
    b=1 layout documented above.  The reference does this one thread-block
    per block-row inside the PCG kernel (GBD-PCG, inferred); here it is
    2b+1 batched matvecs + shifts, which XLA fuses into one pass.
    """
    nbands = S.shape[1]
    half = nbands // 2
    y = jnp.einsum("kij,kj->ki", S[:, half], x)
    for d in range(1, half + 1):
        # slot half-d: block (k, k-d), valid for k >= d
        lo = jnp.einsum("kij,kj->ki", S[d:, half - d], x[:-d])
        # slot half+d: block (k, k+d), valid for k <= N-1-d
        hi = jnp.einsum("kij,kj->ki", S[:-d, half + d], x[d:])
        y = y.at[d:].add(lo)
        y = y.at[:-d].add(hi)
    return y


def btd_to_dense(S: jnp.ndarray) -> jnp.ndarray:
    """Densify (for tests / oracles): (N,3,n,n) -> (N*n, N*n)."""
    N, _, n, _ = S.shape
    out = jnp.zeros((N * n, N * n), S.dtype)
    for k in range(N):
        out = out.at[k * n : (k + 1) * n, k * n : (k + 1) * n].set(S[k, 1])
        if k > 0:
            out = out.at[k * n : (k + 1) * n, (k - 1) * n : k * n].set(S[k, 0])
        if k < N - 1:
            out = out.at[k * n : (k + 1) * n, (k + 1) * n : (k + 2) * n].set(S[k, 2])
    return out
