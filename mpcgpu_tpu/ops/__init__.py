"""Block-tridiagonal linear algebra: Schur condensation, PCG, direct LDL^T."""

from mpcgpu_tpu.ops.btd import btd_matvec, btd_to_dense
from mpcgpu_tpu.ops.schur import SchurSystem, form_schur_system, compute_dz
from mpcgpu_tpu.ops.pcg import pcg_solve
from mpcgpu_tpu.ops.ldl import btd_ldl_solve

__all__ = [
    "btd_matvec",
    "btd_to_dense",
    "SchurSystem",
    "form_schur_system",
    "compute_dz",
    "pcg_solve",
    "btd_ldl_solve",
]
