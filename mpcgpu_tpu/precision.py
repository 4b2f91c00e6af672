"""Float32 matmul-precision enforcement.

On TPU, XLA's DEFAULT matmul precision computes f32 contractions via bf16
passes. For this solver that is catastrophic: the Schur complement and stair
preconditioner blocks come out wrong at ~1e-3 relative error, CG stalls, and
"converged" solutions carry O(10) true residuals (measured: |r| = 27.6
default vs 0.83 highest on a cond~7e5 IIWA N=32 system).  Every public
compute entry point is wrapped so all einsums/matmuls trace with HIGHEST
(full f32) precision — the reference's CUDA arithmetic is genuine fp32
(settings.cuh:41-49), so this is also the parity-correct choice.  The blocks
are tiny (14x14), so the extra MXU passes are latency-noise.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Trace fn under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
