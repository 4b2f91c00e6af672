"""Shard-local fused KKT+Schur slab kernel (boundary-mask mode) vs the
full-horizon fused kernel: every interior lane of every slab must reproduce
the global S/Pinv/gamma exactly (VERDICT r2 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.solver.kkt_pallas import (build_kkt_schur_pallas,
                                          build_kkt_schur_pallas_slab)
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

N = 16
NX = 14
DT = 1.0 / 64.0
H = 2  # halo knots per side (stair Pinv has a 2-hop left dependency)


def _problem(dtype=jnp.float32):
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], dtype)
    return model, cost, xu, ee


def test_slab_kernel_matches_full_kernel():
    model, cost, xu, ee = _problem()
    rho = jnp.float32(1e-3)

    full = build_kkt_schur_pallas(
        model, cost, xu, xu[0, :NX], ee, rho, DT, interpret=True)

    x = xu[:, :NX]
    # terminal x_eval substitution is caller-side and config-gated (the
    # default terminal_at_last_state=True means NO substitution)
    x_eval_full = x if cost.terminal_at_last_state else x.at[N - 1].set(x[N - 2])

    n_shard, L = 4, N // 4
    for s in range(n_shard):
        lo, hi = s * L, (s + 1) * L
        # halo windows clamped at the global edges; out-of-range halo lanes
        # are filled by edge replication (their outputs are discarded, they
        # only need to be finite)
        idx = np.clip(np.arange(lo - H, hi + H), 0, N - 1)
        xu_ext = xu[idx]
        ee_ext = ee[idx]
        gpos = np.arange(lo - H, hi + H)
        first_m = jnp.asarray((gpos == 0).astype(np.float32))
        last_m = jnp.asarray((gpos == N - 1).astype(np.float32))
        x_ext = xu_ext[:, :NX]
        if cost.terminal_at_last_state:
            x_eval_ext = x_ext
        else:
            x_prev = jnp.concatenate([x_ext[:1], x_ext[:-1]], axis=0)
            x_eval_ext = jnp.where((gpos == N - 1)[:, None], x_prev, x_ext)

        slab = build_kkt_schur_pallas_slab(
            model, cost, xu_ext, x_eval_ext, ee_ext, first_m, last_m,
            rho, DT, interpret=True)

        sl = slice(H, H + L)
        for key in ("S", "Pinv", "gamma", "Qinv", "A", "B", "q"):
            got = np.asarray(slab[key][..., sl])
            want = np.asarray(full[key][..., lo:hi])
            scale = max(float(np.max(np.abs(want))), 1.0)
            np.testing.assert_allclose(
                got, want, atol=2e-6 * scale,
                err_msg=f"{key} mismatch, shard {s}")
        # sanity: the x_eval substitution actually matters for the last shard
        if s == n_shard - 1:
            np.testing.assert_allclose(
                np.asarray(x_eval_ext[H + L - 1]), np.asarray(x_eval_full[N - 1]))
