#!/usr/bin/env python3
"""Generate standalone trajectory fixtures (C19-equivalent) with our own stack.

The reference ships recorded IIWA traces (examples/trajfiles/{s}_{g}_traj.csv:
666 rows x 21 = 14 state + 7 control per knot; {s}_{g}_eepos.traj: 666 x 6 =
ee [xyz, rpy] goal per knot; readCSVToVecVec, include/utils/experiment.cuh:
144-170). This script synthesizes fixtures of the same format so the
framework runs standalone when the reference checkout is absent:

  1. pick a smooth joint-space path q(t) between two workspace poses,
  2. roll the true dynamics forward with a PD tracking controller to obtain a
     dynamically consistent (x, u) trace (defect ~ integrator truncation),
  3. write the FK ee pose of the reference joint path as the goal trace.

Writes data/trajfiles/0_0_traj.csv and 0_0_eepos.traj.  Loader preference
order stays: $MPCGPU_TPU_TRAJDIR > data/trajfiles > /root/reference.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mpcgpu_tpu.models import dynamics, iiwa14

OUT = Path(__file__).resolve().parent.parent / "data" / "trajfiles"
STEPS = 666
DT = 0.015625           # reference trajectory timestep (track_iiwa_pcg.cu:19)
SUBSTEPS = 78           # ~2e-4 s plant substeps, like the reference plant
                        # (integrator.cuh:304, sim_step_time)


def main():
    model = iiwa14(dtype=jnp.float64)
    nq = model.nq

    q0 = np.array([0.0, 0.6, 0.0, -1.2, 0.0, 0.8, 0.0])
    q1 = np.array([0.8, 1.0, 0.4, -0.8, 0.3, 1.4, 0.5])
    t = np.linspace(0.0, 1.0, STEPS)
    blend = 3 * t**2 - 2 * t**3                      # smooth-step
    q_ref = q0[None, :] + blend[:, None] * (q1 - q0)[None, :]
    qd_ref = np.gradient(q_ref, DT, axis=0)

    fk = jax.jit(jax.vmap(lambda q: dynamics.fk_ee(model, q)))
    ee_ref = np.asarray(fk(jnp.asarray(q_ref)))

    # PD + feedforward inverse-dynamics tracking of the joint path,
    # rolled out as one jitted scan over knots (substeps in a fori_loop).
    # Torques are zero-order-held over a whole knot (64 Hz), so gains must be
    # scaled per joint by its inertia: wn = 8 rad/s critically damped keeps
    # h_knot * kd_j / m_j well under the discrete stability bound.
    m_diag = np.diag(np.asarray(dynamics.mass_matrix(model, jnp.asarray(q_ref[0]))))
    wn = 8.0
    kp = jnp.asarray(wn * wn * m_diag)
    kd = jnp.asarray(2.0 * wn * m_diag)
    h = DT / SUBSTEPS

    @jax.jit
    def rollout(q0v, qrefs, qdrefs):
        def knot(carry, ref):
            q, qd = carry
            qr, qdr = ref
            u = dynamics.rnea(model, qr, qdr, jnp.zeros(nq)) \
                + kp * (qr - q) + kd * (qdr - qd)
            row = jnp.concatenate([q, qd, u])

            def sub(i, st):
                q_, qd_ = st
                qdd = dynamics.forward_dynamics_aba(model, q_, qd_, u)
                qd_n = qd_ + h * qdd     # semi-implicit: damping acts this step
                return (q_ + h * qd_n, qd_n)

            q, qd = jax.lax.fori_loop(0, SUBSTEPS, sub, (q, qd))
            return (q, qd), row

        (_, _), rows = jax.lax.scan(
            knot, (q0v, jnp.zeros(nq)), (qrefs, qdrefs))
        return rows

    rows = np.asarray(rollout(jnp.asarray(q_ref[0]), jnp.asarray(q_ref),
                              jnp.asarray(qd_ref)))

    OUT.mkdir(parents=True, exist_ok=True)
    np.savetxt(OUT / "0_0_traj.csv", np.asarray(rows), delimiter=",", fmt="%.10g")
    np.savetxt(OUT / "0_0_eepos.traj", ee_ref, delimiter=",", fmt="%.10g")
    err = np.abs(np.asarray(rows)[-1][:nq] - q_ref[-1]).max()
    print(f"wrote {OUT}/0_0_traj.csv + 0_0_eepos.traj "
          f"({STEPS} rows, final joint tracking err {err:.2e})")


if __name__ == "__main__":
    main()
