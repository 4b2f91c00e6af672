"""Kernel VMEM-fit precheck: the checkPcgOccupancy analogue.

The reference refuses to launch when the cooperative PCG kernel cannot fit
the device (checkPcgOccupancy, /root/reference/examples/track_iiwa_pcg.cu:24,
GBD-PCG utils).  On TPU the analogous resource is VMEM: the fused pipeline
keeps the Schur system, the stair preconditioner, and the whole CG working
set on-chip for the whole solve, and XLA additionally pins pallas-to-pallas
intermediate buffers in scoped VMEM.  This module computes that footprint
from (nq, N, dtype) so the solver can fall back to the XLA twins with a
logged reason instead of gating on hardcoded horizon constants.

Budget: defaults to 24 MiB — above every validated IIWA operating point
(N=512 f32 estimates ~4.6 MiB; the largest measured resident set on the v5e
ran comfortably) while tripping well before a genuinely oversized problem
(nq >= ~18 at N=512 f32).  Override with $MPCGPU_TPU_VMEM_BUDGET_MB on
hardware known to have more (or less) head-room.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("mpcgpu_tpu")

# Mosaic-compile validation envelope (independent of VMEM): the fused
# KKT/Schur/PCG kernels are compile-validated through 512 knot lanes
# (kkt_pallas._kkt_core laundering notes); the merit kernel splits its
# alpha axis over a grid beyond 2304 lanes but one alpha's N lanes must fit.
MOSAIC_VALIDATED_MAX_KNOT_LANES = 512
MERIT_MAX_LANES = 2304

_DEFAULT_BUDGET_MB = 24.0   # > the validated 19.4 MiB N=512 working set


def vmem_budget_bytes() -> int:
    mb = float(os.environ.get("MPCGPU_TPU_VMEM_BUDGET_MB", _DEFAULT_BUDGET_MB))
    return int(mb * (1 << 20))


def _itemsize(dtype) -> int:
    import numpy as np

    return np.dtype(dtype).itemsize


def fused_pipeline_vmem_bytes(nq: int, N: int, dtype, batch_lanes: int | None = None) -> int:
    """Peak VMEM working set of the fused KKT+Schur -> PCG -> dz chain.

    Dominated by the PCG solve with S and Pinv resident: 2 * 3 * nx^2 * L.
    The pinned inter-kernel buffers (Qinv, A, B, gamma, q for dz recovery)
    coexist with it, plus ~7 (nx, L) CG vectors.  A 1.25x factor covers
    Mosaic temporaries and sublane padding (nx rows pad to the f32 tile's
    8-sublane multiple).
    """
    nx = 2 * nq
    L = N if batch_lanes is None else batch_lanes
    per_lane = (
        2 * 3 * nx * nx        # S + Pinv (BTD, 3 slots each)
        + 2 * nx * nx          # Qinv + A (pinned for dz)
        + nx * nq              # B
        + 9 * nx               # gamma, q, lam, r, p, z, ...
    )
    return int(1.25 * per_lane * L * _itemsize(dtype))


def check_pcg_occupancy(nq: int, N: int, dtype,
                        budget_bytes: int | None = None,
                        batch_lanes: int | None = None) -> tuple[bool, str]:
    """(fits, reason).  fits=False means the caller should run the XLA twins.

    Checks BOTH the Mosaic-validated lane envelope and the computed VMEM
    footprint, so an unusual nq or dtype is caught by arithmetic rather than
    silently landing on the wrong side of a hardcoded horizon constant.
    """
    budget = vmem_budget_bytes() if budget_bytes is None else budget_bytes
    lanes = N if batch_lanes is None else batch_lanes
    if lanes > MOSAIC_VALIDATED_MAX_KNOT_LANES:
        return False, (
            f"{lanes} knot lanes exceed the Mosaic-validated envelope "
            f"({MOSAIC_VALIDATED_MAX_KNOT_LANES})")
    need = fused_pipeline_vmem_bytes(nq, N, dtype, batch_lanes=batch_lanes)
    if need > budget:
        return False, (
            f"estimated fused-pipeline VMEM {need / 2**20:.1f} MiB exceeds "
            f"budget {budget / 2**20:.1f} MiB (nq={nq}, N={N}, "
            f"dtype={dtype}); set $MPCGPU_TPU_VMEM_BUDGET_MB to raise")
    return True, f"fits: {need / 2**20:.1f} MiB of {budget / 2**20:.1f} MiB"


def check_merit_occupancy(N: int, num_candidates: int) -> tuple[bool, str]:
    """Single-alpha lane bound for the fused merit kernel (the alpha axis
    itself splits over the Pallas grid beyond MERIT_MAX_LANES)."""
    if N > MERIT_MAX_LANES:
        return False, (f"merit kernel needs N={N} lanes per candidate; "
                       f"validated to {MERIT_MAX_LANES}")
    return True, "fits"
