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


def __getattr__(name):
    # lazy top-level conveniences (keep import light; jax loads on demand)
    if name in ("sqp_solve", "make_sqp_solver"):
        from mpcgpu_tpu.solver import sqp
        return getattr(sqp, name)
    if name in ("simulate_mpc", "simulate_mpc_ondevice",
                "simulate_mpc_ondevice_batched"):
        from mpcgpu_tpu.sim import mpc
        return getattr(mpc, name)
    if name == "iiwa14":
        from mpcgpu_tpu.models import iiwa14
        return iiwa14
    raise AttributeError(name)


__all__ = [
    "CostConfig",
    "PCGConfig",
    "SQPConfig",
    "SimConfig",
    "sqp_solve",
    "make_sqp_solver",
    "simulate_mpc",
    "simulate_mpc_ondevice",
    "simulate_mpc_ondevice_batched",
    "iiwa14",
]

__version__ = "0.2.0"
