"""Spatial (Plücker) algebra primitives, Featherstone convention [angular; linear].

Replaces the reference's single-thread spatial helpers (dot_prod / mx0..mx5 /
fx / fx_times_v, iiwa_eepos_grid.cuh:152-908) with vectorizable JAX ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w):
    """3-vector -> 3x3 cross-product matrix (batched over leading dims)."""
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def crm(v):
    """Spatial motion cross operator: crm(v) @ m == v x m (6x6, batched)."""
    wx = skew(v[..., 0:3])
    vx = skew(v[..., 3:6])
    zero = jnp.zeros_like(wx)
    top = jnp.concatenate([wx, zero], axis=-1)
    bot = jnp.concatenate([vx, wx], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Spatial force cross operator: crf(v) = -crm(v)^T."""
    return -jnp.swapaxes(crm(v), -1, -2)


def crm_apply(v, m):
    """v x m for motion vectors without materializing the 6x6 operator."""
    w, vo = v[..., 0:3], v[..., 3:6]
    mw, mv = m[..., 0:3], m[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(vo, mw) + jnp.cross(w, mv)], axis=-1
    )


def crf_apply(v, f):
    """v x* f for force vectors: crf(v) @ f."""
    w, vo = v[..., 0:3], v[..., 3:6]
    fw, fv = f[..., 0:3], f[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, fw) + jnp.cross(vo, fv), jnp.cross(w, fv)], axis=-1
    )
