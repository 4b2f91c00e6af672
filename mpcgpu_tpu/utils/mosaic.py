"""Shared Mosaic compiler parameters for every Pallas kernel in the package.

The fused kernels are designed to own the chip's VMEM for the duration of a
solve (the whole point of the VMEM-resident pipeline — see solver/kkt_pallas
and ops/pcg_pallas).  XLA's *scoped-vmem* accounting for a tpu_custom_call,
however, defaults to a 16 MiB stack budget on the v5e AOT compile path, and
the fused KKT+Schur kernel's Mosaic-allocated temporaries alone need ~23 MiB
at N=32 (measured 2026-08-18: "Scoped allocation with size 22.64M and limit
16.00M exceeded scoped vmem limit" — the round-2 on-device compiler used a
larger default, so this only started failing when the tunnel switched to
chipless AOT compilation).  Raising ``vmem_limit_bytes`` per kernel is the
supported knob; 100 MiB leaves headroom under the chip's 128 MiB VMEM for
the kernels' regular operand/output buffers.

Override with ``$MPCGPU_TPU_KERNEL_VMEM_LIMIT_BYTES`` when experimenting.
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu

_DEFAULT_LIMIT_BYTES = 100 * 1024 * 1024


def kernel_compiler_params(**overrides) -> pltpu.CompilerParams:
    """CompilerParams with the package-wide VMEM limit (plus overrides)."""
    limit = int(os.environ.get("MPCGPU_TPU_KERNEL_VMEM_LIMIT_BYTES",
                               _DEFAULT_LIMIT_BYTES))
    return pltpu.CompilerParams(vmem_limit_bytes=limit, **overrides)
