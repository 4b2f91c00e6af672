"""mpcgpu_tpu — a TPU-native nonlinear MPC (SQP + PCG) solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of A2R-Lab/MPCGPU
(real-time SQP trajectory optimization with block-tridiagonal Schur-complement
KKT systems solved by symmetric-stair-preconditioned conjugate gradient), built
TPU-first:

  * dims are static jit arguments; data lives in ``[N, ...]`` knot-leading
    block arrays (pytrees), not ragged device buffers;
  * rigid-body dynamics + analytic gradients are batched JAX functions built
    from extracted model data (GRiD-equivalent, see ``models/``);
  * the PCG inner loop is a single fused on-device loop (``lax.while_loop``
    and a Pallas VMEM-resident kernel);
  * scaling is ``jax.sharding``/``shard_map`` over an ``(instance, knot)``
    mesh with `ppermute` halo exchange, not host-driven multi-process code.

Reference parity citations throughout point at /root/reference (MPCGPU).
"""

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig, SimConfig

__all__ = [
    "CostConfig",
    "PCGConfig",
    "SQPConfig",
    "SimConfig",
]

__version__ = "0.1.0"
