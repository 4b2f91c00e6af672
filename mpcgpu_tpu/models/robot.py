"""RobotModel: a serial-chain rigid body model as a JAX pytree.

Equivalent role to ``grid::robotModel`` (iiwa_eepos_grid.cuh:110-114) — the
baked spatial transforms and inertias — but stored as the affine-in-(sin, cos)
decomposition so that all per-q transform updates become one fused broadcast:

    X_k(q)    = xc[k] + sin(q_k) * xs[k] + cos(q_k) * xcos[k]      (6x6 motion)
    Xhom_k(q) = hc[k] + sin(q_k) * hs[k] + cos(q_k) * hcos[k]      (4x4 homogeneous)

mirroring load_update_XImats_helpers / load_update_XmatsHom_helpers
(iiwa_eepos_grid.cuh:1770-1845, :1917-2000).  Joints are revolute about the
local z axis (S = e_z), parents are ``k-1`` (serial chain), matching the GRiD
iiwa14 build.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotModel:
    # affine decomposition of the 6x6 spatial motion transforms, each (nq,6,6)
    xc: jax.Array
    xs: jax.Array
    xcos: jax.Array
    # spatial inertias, (nq,6,6)
    inertia: jax.Array
    # affine decomposition of the 4x4 homogeneous transforms, each (nq,4,4)
    hc: jax.Array
    hs: jax.Array
    hcos: jax.Array
    # base gravitational acceleration magnitude (reference: GRAVITY()=0,
    # iiwa_eepos_plant.cuh:51); enters RNEA as base accel [0,0,0, 0,0,g]
    # (iiwa_eepos_grid.cuh:2752-2756).
    gravity: float = dataclasses.field(default=0.0, metadata=dict(static=True))

    @property
    def nq(self) -> int:
        return self.xc.shape[0]

    def astype(self, dtype) -> "RobotModel":
        return jax.tree.map(lambda a: jnp.asarray(a, dtype), self)

    def xmats(self, q: jax.Array) -> jax.Array:
        """Per-joint spatial motion transforms X_k(q), shape (nq, 6, 6)."""
        s = jnp.sin(q)[:, None, None]
        c = jnp.cos(q)[:, None, None]
        return self.xc + s * self.xs + c * self.xcos

    def hom_xmats(self, q: jax.Array) -> jax.Array:
        """Per-joint homogeneous transforms Xhom_k(q), shape (nq, 4, 4)."""
        s = jnp.sin(q)[:, None, None]
        c = jnp.cos(q)[:, None, None]
        return self.hc + s * self.hs + c * self.hcos
