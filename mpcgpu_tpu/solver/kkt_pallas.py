"""Fused Pallas KKT-assembly kernel: dynamics linearization + GN cost, one pass.

Pallas equivalent of the reference's generate_kkt_submatrices kernel chain
(include/common/kkt.cuh:22-163 -> gato_plant::forwardDynamicsAndGradient,
iiwa_eepos_plant.cuh:126-156 -> the GRiD codegen stack,
iiwa_eepos_grid.cuh:1770-5687) — and of this repo's XLA path
(solver/kkt.py::build_kkt), whose lowering materializes ~50 MB of per-knot
intermediates across ~64 fusions.

Everything runs VMEM-resident with the knot axis on lanes:

  * forward-mode RNEA with all 14 tangent directions (7 dq, 7 dqd) carried as
    a "multi-vector" axis: spatial quantities are (6, 1+14, N) tiles, so each
    recursion step is a handful of lane-broadcast FMAs.  Algebraically
    identical to jax.jacfwd over models/dynamics.py::rnea (which itself
    mirrors GRiD's inverse_dynamics_gradient_inner, iiwa_eepos_grid.cuh:4558).
  * CRBA mass matrix + unrolled Gauss-Jordan inverse on (7, 7, N) tiles
    (models/dynamics.py::mass_matrix / ops/smallmat.py, lane-packed).
  * FK + ee Jacobian by a product-rule homogeneous-transform chain with 7
    q-tangents (iiwa_eepos_grid.cuh:2255-2509 equivalent).
  * Euler / semi-implicit integrator Jacobians and the reference's
    Gauss-Newton gradient-outer-product cost Hessian assembled in-kernel
    (integrator.cuh:59-130, iiwa_eepos_plant.cuh:295-378).

Outputs are returned in the standard knot-leading layout of
solver/kkt.py::KKTBlocks (transposes fuse into the downstream Schur stage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.utils.mosaic import kernel_compiler_params

from mpcgpu_tpu.config import CostConfig
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.precision import highest_precision



def _mm6(M, V):
    """(6,6,B) @ (6,T,B) -> (6,T,B) (contract over the 6 middle index)."""
    acc = M[:, 0:1, :] * V[0:1, :, :]
    for j in range(1, 6):
        acc = acc + M[:, j : j + 1, :] * V[j : j + 1, :, :]
    return acc


def _mm6_T(M, V):
    """M^T @ V for M (6,6,B), V (6,T,B): out[i] = sum_j M[j,i,:] V[j]."""
    out = M[0, :, :][:, None, :] * V[0:1, :, :]
    for j in range(1, 6):
        out = out + M[j, :, :][:, None, :] * V[j : j + 1, :, :]
    return out


def _cross_multi(a, b):
    """a x b on (3,T,B) tiles (componentwise cross along axis 0)."""
    ar1 = pltpu.roll(a, 2, axis=0)
    br2 = pltpu.roll(b, 1, axis=0)
    ar2 = pltpu.roll(a, 1, axis=0)
    br1 = pltpu.roll(b, 2, axis=0)
    return ar1 * br2 - ar2 * br1


def _crf_fixed_f(v_multi, g):
    """crf(v_t, g) for every column of v_multi (6,T,B), g (6,1,B) fixed:
    [w_t x g_w + vo_t x g_v ; w_t x g_v]."""
    w, vo = v_multi[0:3], v_multi[3:6]
    gw = jnp.broadcast_to(g[0:3], w.shape)
    gv = jnp.broadcast_to(g[3:6], w.shape)
    return jnp.concatenate(
        [_cross_multi(w, gw) + _cross_multi(vo, gv), _cross_multi(w, gv)], axis=0
    )


def _crf_fixed_v(v, f_multi):
    """crf(v, f_t) for fixed v (6,1,B), every column of f_multi (6,T,B)."""
    w = jnp.broadcast_to(v[0:3], f_multi[0:3].shape)
    vo = jnp.broadcast_to(v[3:6], f_multi[0:3].shape)
    fw, fv = f_multi[0:3], f_multi[3:6]
    return jnp.concatenate(
        [_cross_multi(w, fw) + _cross_multi(vo, fv), _cross_multi(w, fv)], axis=0
    )


def _shuffle_ez(m):
    """m x e_z pattern: [m1, -m0, 0, m4, -m3, 0] along axis 0 of (6,T,B)."""
    zero = jnp.zeros_like(m[0:1])
    return jnp.concatenate([m[1:2], -m[0:1], zero, m[4:5], -m[3:4], zero], axis=0)


def _gj_inverse_lanes_one(M, n):
    """Unrolled Gauss-Jordan inverse of (n,n,B) lane-packed SPD blocks.

    Mosaic-validated for B <= 128 lanes (one lane vreg); the full pivot-step
    where/broadcast pattern aborts the compiler beyond that — see
    _inv_lanes for the >128 strategies."""
    B = M.shape[2]
    dtype = M.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n, B), 1)
    Inv = (row == col).astype(dtype)
    A = M
    shape = A.shape
    for i in range(n):
        dinv = 1.0 / A[i : i + 1, i, :]                  # (1,B)
        arow = A[i, :, :] * dinv                          # (n,B) scaled pivot row
        irow = Inv[i, :, :] * dinv
        isrow = (row == i)
        arow3 = jnp.broadcast_to(arow[None, :, :], shape)
        irow3 = jnp.broadcast_to(irow[None, :, :], shape)
        A = jnp.where(isrow, arow3, A)
        Inv = jnp.where(isrow, irow3, Inv)
        f = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, B), 0) == i, 0.0, A[:, i, :]
        )                                                 # (n,B) elim factors
        f3 = jnp.broadcast_to(f[:, None, :], shape)
        A = A - f3 * arow3
        Inv = Inv - f3 * irow3
    return Inv


def _gj_inverse_lanes_masked(M, n):
    """Gauss-Jordan via arithmetic blends ONLY (no jnp.where in the pivot
    step): row replacement and elimination fold into one FMA per tensor,
        A <- A * (1 - e_i) + (e_i - f) * arow
    with float masks built from target-shape iotas.  Written to dodge the
    Mosaic multi-lane-vreg where/broadcast abort (see _inv_lanes)."""
    B = M.shape[2]
    dtype = M.dtype
    shape = (n, n, B)
    row3 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    Inv = (row3 == col3).astype(dtype)
    A = M
    for i in range(n):
        dinv = 1.0 / A[i : i + 1, i, :]                   # (1,B)
        arow = A[i, :, :] * dinv                          # (n,B)
        irow = Inv[i, :, :] * dinv
        onehot2 = (row2 == i).astype(dtype)               # (n,B)
        f = A[:, i, :] * (1.0 - onehot2)                  # (n,B), 0 at row i
        blend = (row3 == i).astype(dtype) - jnp.broadcast_to(f[:, None, :], shape)
        keep = (row3 != i).astype(dtype)
        arow3 = jnp.broadcast_to(arow[None, :, :], shape)
        irow3 = jnp.broadcast_to(irow[None, :, :], shape)
        A = A * keep + blend * arow3
        Inv = Inv * keep + blend * irow3
    return Inv


def _chol_inverse_lanes(M, n):
    """SPD inverse by fully-unrolled scalar-row Cholesky: every intermediate
    is a (1,B) lane row (no (n,n,B) pivot broadcasts at all), so no Mosaic
    multi-vreg pattern can form.  ~n^3/2 FMAs on (1,B) rows — more
    instructions than Gauss-Jordan tiles but layout-trivial.
    A = L L^T; G = L^{-1}; A^{-1}[i,j] = sum_k G[k,i] G[k,j]."""
    B = M.shape[2]
    L = [[None] * n for _ in range(n)]
    d = [None] * n                                       # 1 / L[j][j]
    for j in range(n):
        s = M[j : j + 1, j, :]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d[j] = jax.lax.rsqrt(s)
        for i in range(j + 1, n):
            t = M[i : i + 1, j, :]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * d[j]
    # G = L^{-1}, lower triangular, G[j][j] = d[j]
    G = [[None] * n for _ in range(n)]
    for j in range(n):
        G[j][j] = d[j]
        for i in range(j + 1, n):
            acc = L[i][j] * G[j][j]
            for k in range(j + 1, i):
                acc = acc + L[i][k] * G[k][j]
            G[i][j] = -d[i] * acc
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            lo = max(i, j)
            acc = G[lo][i] * G[lo][j] if lo == i or lo == j else G[lo][i] * G[lo][j]
            for k in range(lo + 1, n):
                acc = acc + G[k][i] * G[k][j]
            cols.append(acc)                              # (1,B)
        rows.append(jnp.concatenate(cols, axis=0)[None])  # (1,n,B)
    return jnp.concatenate(rows, axis=0)                  # (n,n,B)


# inverse implementation for >128-lane tiles; switchable so the TPU-validated
# winner can be selected without touching the kernels.
# "chunked" (128-lane slices through the GJ tile path) HANGS the Mosaic
# remote compiler at >128 lanes — do not re-enable without re-validating;
# "chol" (scalar-row Cholesky, no multi-vreg pivot broadcasts) is the
# default for the >128 range.
_INV_IMPL = "chol"             # "chunked" | "masked" | "chol"
_LANE_CHUNK = 128


def _inv_lanes(M, n):
    """Lane-packed SPD block inverse, valid for any lane count B.

    B <= 128: the proven Gauss-Jordan tile path.  Beyond one lane vreg the
    GJ pivot pattern hits an unresolved Mosaic abort ("limits[i] <= dim(i)",
    see .claude/skills/verify/SKILL.md), so the lane axis is processed in
    128-lane chunks (static slices at vreg-aligned offsets), or with one of
    the alternative formulations (_gj_inverse_lanes_masked /
    _chol_inverse_lanes) selected via _INV_IMPL."""
    B = M.shape[2]
    if B <= _LANE_CHUNK:
        return _gj_inverse_lanes_one(M, n)
    if _INV_IMPL == "masked":
        return _gj_inverse_lanes_masked(M, n)
    if _INV_IMPL == "chol":
        return _chol_inverse_lanes(M, n)
    outs = [_gj_inverse_lanes_one(M[:, :, c : c + _LANE_CHUNK], n)
            for c in range(0, B, _LANE_CHUNK)]
    return jnp.concatenate(outs, axis=2)


# back-compat alias (existing kernels and tests call _gj_inverse_lanes)
def _gj_inverse_lanes(M, n):
    return _inv_lanes(M, n)


def _mmn(Ma, Mb, n):
    """(n,n,B) @ (n,n,B)."""
    cols = []
    for l in range(n):
        acc = Ma[:, 0, :] * Mb[0:1, l, :]
        for j in range(1, n):
            acc = acc + Ma[:, j, :] * Mb[j : j + 1, l, :]
        cols.append(acc)
    return jnp.stack(cols, axis=1)


def _mv6_T(M, v):
    """M^T @ v for M (6,6,B), v (6,B)."""
    acc = M[0, :, :] * v[0:1, :]
    for j in range(1, 6):
        acc = acc + M[j, :, :] * v[j : j + 1, :]
    return acc


def _kkt_core(xu_ref, xeval_ref, goal_ref, dt,
              xc_ref, xsin_ref, xcos_ref, I_ref, hc_ref, hsin_ref, hcos_ref,
              nq, N, integrator_type, gravity, qd_cost, angle_wrap=False,
              crba_scr=None):
    """Traced core shared by the KKT and KKT+Schur kernels; returns the
    lane-packed blocks (Amat, Bmat, Qmat, grad, xnext, Minv, qdd, dqdd)."""
    nx = 2 * nq
    NT = 1 + 2 * nq   # multi-vector width: value column + nq dq + nq dqd
    xu = xu_ref[:]                               # (nx+nu, N)
    q = xu[0:nq]
    qd = xu[nq:nx]
    u = xu[nx : nx + nq]
    s = jnp.sin(q)
    c = jnp.cos(q)

    X, Xp = [], []                                # X_j and dX_j/dq_j
    def bc(M):
        # explicit lane broadcast: implicit (6,6,1) -> (6,6,N) broadcasts
        # crash Mosaic once N spans multiple lane vregs (> 128)
        return jnp.broadcast_to(M[:, :, None], (6, 6, N))
    for j in range(nq):
        sj = jnp.broadcast_to(s[j : j + 1, :][None], (6, 6, N))
        cj = jnp.broadcast_to(c[j : j + 1, :][None], (6, 6, N))
        X.append(bc(xc_ref[j]) + sj * bc(xsin_ref[j]) + cj * bc(xcos_ref[j]))
        Xp.append(cj * bc(xsin_ref[j]) - sj * bc(xcos_ref[j]))

    def rnea_pass(qdd_rows, nt):
        """RNEA pass with `nt` columns: nt = 1 is the value-only bias pass,
        nt = NT carries all 14 tangent directions.  qdd_rows = None (bias)
        or a (nq, N) constant joint acceleration.  Returns (nq, nt, N)."""
        row6t = jax.lax.broadcasted_iota(jnp.int32, (6, nt, N), 0)
        colt = jax.lax.broadcasted_iota(jnp.int32, (6, nt, N), 1)
        ez_val = ((row6t == 2) & (colt == 0)).astype(xu.dtype)  # e_z, value col
        tangents = nt > 1

        def tcol(expr, col):
            """Add `expr` (6,1,N) into tangent column `col` (no-op if nt=1)."""
            return jnp.where(colt == col, jnp.broadcast_to(expr, colt.shape), 0.0)

        v_par = None
        a_par = None
        fs = []
        if gravity != 0.0:
            a_par = ((row6t == 5) & (colt == 0)).astype(xu.dtype) * gravity
        for k in range(nq):
            qdk = qd[k : k + 1, :][None]              # (1,1,N)
            if v_par is None:
                v = ez_val * qdk
            else:
                v = _mm6(X[k], v_par) + ez_val * qdk
                if tangents:
                    # d/dq_k of X_k v_par: value col -> tangent col 1+k
                    v = v + tcol(_mm6(Xp[k], v_par[:, 0:1, :]), 1 + k)
            if tangents:
                # qd_k tangent of vJ: e_z in column 1+nq+k
                v = v + ((row6t == 2) & (colt == 1 + nq + k)).astype(xu.dtype)
            if a_par is None:
                a = jnp.zeros_like(v)
            else:
                a = _mm6(X[k], a_par)
                if tangents:
                    a = a + tcol(_mm6(Xp[k], a_par[:, 0:1, :]), 1 + k)
            # bias acceleration: v x (e_z qd_k), bilinear
            sh = _shuffle_ez(v)
            a = a + sh * qdk
            if tangents:
                a = a + tcol(sh[:, 0:1, :], 1 + nq + k)
            if qdd_rows is not None:
                a = a + ez_val * qdd_rows[k : k + 1, :][None]
            # spatial force f = I a + crf(v, I v)
            Ik = I_ref[k][:, :, None]
            Iv = _mm6(Ik, v)
            f = _mm6(Ik, a)
            g0 = Iv[:, 0:1, :]
            v0 = v[:, 0:1, :]
            if tangents:
                vz = jnp.where(colt == 0, 0.0, v)
                Ivz = jnp.where(colt == 0, 0.0, Iv)
                f = f + _crf_fixed_f(vz, g0) + _crf_fixed_v(v0, Ivz)
                f = f + tcol(_crf_fixed_v(v0, g0), 0)
            else:
                f = f + _crf_fixed_v(v0, g0)
            fs.append(f)
            v_par, a_par = v, a
        taus = [None] * nq
        f_carry = fs[nq - 1]
        for k in range(nq - 1, -1, -1):
            taus[k] = f_carry[2]                      # (nt, N)
            if k > 0:
                fc = _mm6_T(X[k], f_carry)
                if tangents:
                    # d/dq_k of X_k^T f: uses the carry's VALUE column
                    xf = _mm6_T(Xp[k], f_carry[:, 0:1, :])
                    fc = fc + tcol(xf, 1 + k)
                f_carry = fs[k - 1] + fc
        return jnp.stack(taus, axis=0)                # (nq, nt, N)

    # CRBA mass matrix (value only)
    IC = [jnp.broadcast_to(I_ref[k][:, :, None], (6, 6, N)) for k in range(nq)]
    for k in range(nq - 1, 0, -1):
        IC[k - 1] = IC[k - 1] + _mm6_T(X[k], _mmn(IC[k], X[k], 6))
    if crba_scr is not None:
        # >128-lane path: interleaving slices of the accumulated IC with the
        # F-matrix where/propagate loop aborts Mosaic on multi-lane-vreg
        # tiles (empirically bisected; "limits[i] <= dim(i)").  LAUNDER the
        # IC z-columns through a VMEM scratch store/reload — a clean layout
        # provenance — and build M by per-column matvec propagation
        # (same math: M[j,k] = e_z^T X_{j+1}^T..X_k^T IC_k e_z for j <= k).
        for k in range(nq):
            crba_scr[k] = IC[k][:, 2, :]
        Mrows = [[None] * nq for _ in range(nq)]
        for k in range(nq):
            v = crba_scr[k]                           # (6, N) relaid
            Mrows[k][k] = v[2:3, :]
            for j in range(k - 1, -1, -1):
                v = _mv6_T(X[j + 1], v)
                Mrows[j][k] = v[2:3, :]
        for j in range(nq):
            for k in range(j):
                Mrows[j][k] = Mrows[k][j]
        M = jnp.concatenate(
            [jnp.concatenate(Mrows[j], axis=0)[None] for j in range(nq)],
            axis=0)                                   # (nq, nq, N)
    else:
        F = jnp.zeros((6, nq, N), xu.dtype)
        rows = [None] * nq
        coln = jax.lax.broadcasted_iota(jnp.int32, (6, nq, N), 1)
        for j in range(nq - 1, -1, -1):
            F = jnp.where(coln == j, jnp.broadcast_to(IC[j][:, 2, :][:, None, :], F.shape), F)
            rows[j] = F[2]                            # (nq, N): M[j, k] for k >= j
            if j > 0:
                F = _mm6_T(X[j], F)
        Mupper = jnp.stack(rows, axis=0)              # (nq, nq, N) upper (row<=col)
        rown = jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 0)
        colnn = jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 1)
        MuT = jnp.stack([Mupper[:, i, :] for i in range(nq)], axis=0)  # transpose01
        M = jnp.where(rown <= colnn, Mupper, MuT)
    Minv = _gj_inverse_lanes(M, nq)                   # (nq, nq, N)

    # bias + qdd
    tau_bias = rnea_pass(None, 1)
    c_bias = tau_bias[:, 0, :]                  # (nq, N)
    umc = u - c_bias
    qdd = Minv[:, 0, :] * umc[0:1, :]
    for j in range(1, nq):
        qdd = qdd + Minv[:, j, :] * umc[j : j + 1, :]  # (nq, N)

    # tangent RNEA at fixed qdd -> dID/dq, dID/dqd
    tau_multi = rnea_pass(qdd, NT)
    dID = jnp.stack([tau_multi[:, 1 + t, :] for t in range(2 * nq)], axis=1)
    # dqdd/d{q,qd} = -Minv @ dID  -> (nq, 2nq, N)
    dqdd = -(Minv[:, 0:1, :] * dID[0:1, :, :])
    for j in range(1, nq):
        dqdd = dqdd - Minv[:, j : j + 1, :] * dID[j : j + 1, :, :]
    dq_blk = dqdd[:, 0:nq, :]                         # d qdd / d q
    dqd_blk = dqdd[:, nq : 2 * nq, :]                 # d qdd / d qd

    # ---------- integrator step + Jacobians (integrator.cuh:59-130) ----
    rowx = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, N), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, N), 1)
    eyex = (rowx == colx).astype(xu.dtype)
    if integrator_type == 0:
        qn = q + dt * qd
        qdn = qd + dt * qdd
        rowt = jax.lax.broadcasted_iota(jnp.int32, (nq, nx, N), 0)
        colt2 = jax.lax.broadcasted_iota(jnp.int32, (nq, nx, N), 1)
        top = jnp.where(colt2 == rowt + nq, dt, 0.0)
        bot = jnp.concatenate([dt * dq_blk, dt * dqd_blk], axis=1)
        Amat = eyex + jnp.concatenate([top, bot], axis=0)
        Bmat = jnp.concatenate(
            [jnp.zeros((nq, nq, N), xu.dtype), dt * Minv], axis=0
        )
    else:
        qdn = qd + dt * qdd
        qn = q + dt * qdn
        eyeq = (jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 1)
                ).astype(xu.dtype)
        top = jnp.concatenate(
            [dt * dt * dq_blk, dt * eyeq + dt * dt * dqd_blk], axis=1
        )
        bot = jnp.concatenate([dt * dq_blk, dt * dqd_blk], axis=1)
        Amat = eyex + jnp.concatenate([top, bot], axis=0)
        Bmat = jnp.concatenate([dt * dt * Minv, dt * Minv], axis=0)
    if angle_wrap:
        # ANGLE_WRAP reflection at +-pi (integrator.cuh:12-19); step value
        # only, Jacobians untouched, matching integratorAndGradient
        from mpcgpu_tpu.solver.kkt import _WRAP_PI
        qn = jnp.where(qn > _WRAP_PI, -(qn - _WRAP_PI), qn)
        qn = jnp.where(qn < -_WRAP_PI, -(qn + _WRAP_PI), qn)
    xnext = jnp.concatenate([qn, qdn], axis=0)        # (nx, N)

    # ---------- tracking cost grad/Hessian at xeval ----------
    qe = xeval_ref[0:nq]
    qde = xeval_ref[nq:nx]
    se = jnp.sin(qe)
    ce = jnp.cos(qe)
    # product-rule chain: carry the value transform and the nq tangent
    # transforms separately; tangent t only becomes nonzero at joint t
    Tval = None
    Ttans = [None] * nq                              # each (4,4,N) or None
    for j in range(nq):
        Hj = (hc_ref[j][:, :, None] + se[j : j + 1, :][None] * hsin_ref[j][:, :, None]
              + ce[j : j + 1, :][None] * hcos_ref[j][:, :, None])
        Hpj = (ce[j : j + 1, :][None] * hsin_ref[j][:, :, None]
               - se[j : j + 1, :][None] * hcos_ref[j][:, :, None])
        if Tval is None:
            Tval_new = Hj
            Ttans[0] = Hpj
        else:
            Tval_new = _mmn(Tval, Hj, 4)
            for t in range(j):
                if Ttans[t] is not None:
                    Ttans[t] = _mmn(Ttans[t], Hj, 4)
            Ttans[j] = _mmn(Tval, Hpj, 4)
        Tval = Tval_new
    ee = Tval[0:3, 3, :]                              # (3, N)
    err = ee - goal_ref[:]                            # (3, N)
    gq_rows = []
    for t in range(nq):
        Jt = Ttans[t][0:3, 3, :]                      # (3, N)
        gq_rows.append(_sum3(Jt * err))
    gq = jnp.concatenate(gq_rows, axis=0)             # (nq, N)
    grad = jnp.concatenate([gq, qd_cost * qde], axis=0)   # (nx, N)
    gq_ext = jnp.concatenate([gq, jnp.zeros((nq, N), xu.dtype)], axis=0)
    Qmat = gq_ext[:, None, :] * gq_ext[None, :, :]
    qd_diag = ((rowx == colx) & (rowx >= nq)).astype(xu.dtype) * qd_cost
    Qmat = Qmat + qd_diag

    return Amat, Bmat, Qmat, grad, xnext, Minv, qdd, dqdd


def _make_kkt_kernel(nq: int, N: int, integrator_type: int, gravity: float,
                     qd_cost: float, debug_stage: int = 99,
                     angle_wrap: bool = False, launder: bool = False):
    """debug_stage < 99 truncates the kernel after that stage (zeros for the
    remaining outputs) — a Mosaic-crash bisection aid; not a public knob.
    launder=True adds a VMEM scratch operand and reroutes the CRBA through
    it (required beyond 128 lanes, see _kkt_core)."""

    def kernel(xu_ref, xeval_ref, goal_ref, dt_ref,
               xc_ref, xsin_ref, xcos_ref, I_ref, hc_ref, hsin_ref, hcos_ref,
               A_ref, Bm_ref, Q_ref, qv_ref, xnext_ref, minv_ref,
               *scratch):
        Amat, Bmat, Qmat, grad, xnext, Minv, qdd, dqdd = _kkt_core(
            xu_ref, xeval_ref, goal_ref, dt_ref[0],
            xc_ref, xsin_ref, xcos_ref, I_ref, hc_ref, hsin_ref, hcos_ref,
            nq, N, integrator_type, gravity, qd_cost, angle_wrap,
            crba_scr=scratch[0] if launder else None)
        if debug_stage < 99:
            z = [jnp.zeros_like(Amat), jnp.zeros_like(Bmat), jnp.zeros_like(Qmat),
                 jnp.zeros_like(grad), jnp.zeros_like(xnext), jnp.zeros_like(Minv)]
            picks = {
                0: dict(minv=Minv),
                1: dict(q=jnp.concatenate([qdd, qdd], axis=0)),
                2: dict(q=jnp.concatenate([dqdd[:, 0, :], dqdd[:, nq, :]], axis=0)),
                3: dict(A=Amat, B=Bmat, x=xnext),
                4: dict(q=grad),
                5: dict(Q=Qmat),
            }[debug_stage]
            A_ref[:] = picks.get("A", z[0])
            Bm_ref[:] = picks.get("B", z[1])
            Q_ref[:] = picks.get("Q", z[2])
            qv_ref[:] = picks.get("q", z[3])
            xnext_ref[:] = picks.get("x", z[4])
            minv_ref[:] = picks.get("minv", z[5])
            return

        A_ref[:] = Amat
        Bm_ref[:] = Bmat
        Q_ref[:] = Qmat
        qv_ref[:] = grad
        xnext_ref[:] = xnext
        minv_ref[:] = Minv

    return kernel


def _sum3(x):
    return x[0:1] + x[1:2] + x[2:3]


@highest_precision
@partial(jax.jit, static_argnames=("cost", "integrator_type", "interpret",
                                   "_debug_stage", "angle_wrap"))
def build_kkt_pallas(
    model: RobotModel, cost: CostConfig, xu, xs, ee_goal, dt,
    integrator_type: int = 0, interpret: bool = False, _debug_stage: int = 99,
    angle_wrap: bool = False,
):
    """Fused replacement for solver.kkt.build_kkt (ee cost mode).

    Returns the same KKTBlocks pytree (knot-leading layout).
    """
    from mpcgpu_tpu.solver.kkt import KKTBlocks

    if cost.mode != "ee":
        raise ValueError("pallas KKT kernel supports ee cost mode only")
    nq = model.nq
    nx = 2 * nq
    N = xu.shape[0]
    dtype = xu.dtype

    x = xu[:, :nx]
    x_eval = x if cost.terminal_at_last_state else x.at[N - 1].set(x[N - 2])

    xu_l = xu.T                                           # (nx+nu, N)
    xeval_l = x_eval.T                                    # (nx, N)
    goal_l = ee_goal[:, :3].T                             # (3, N)
    dt_arr = jnp.asarray([dt], dtype)

    launder = N > 128
    A_l, B_l, Q_l, q_l, xnext_l, minv_l = pl.pallas_call(
        _make_kkt_kernel(nq, N, integrator_type, float(model.gravity),
                         float(cost.qd_cost), _debug_stage, angle_wrap,
                         launder),
        out_shape=(
            jax.ShapeDtypeStruct((nx, nx, N), dtype),
            jax.ShapeDtypeStruct((nx, nq, N), dtype),
            jax.ShapeDtypeStruct((nx, nx, N), dtype),
            jax.ShapeDtypeStruct((nx, N), dtype),
            jax.ShapeDtypeStruct((nx, N), dtype),
            jax.ShapeDtypeStruct((nq, nq, N), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)),
        scratch_shapes=(
            [pltpu.VMEM((nq, 6, N), dtype)] if launder else []),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(xu_l, xeval_l, goal_l, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)

    A = jnp.transpose(A_l, (2, 0, 1))[: N - 1]
    B = jnp.transpose(B_l, (2, 0, 1))[: N - 1]
    Q = jnp.transpose(Q_l, (2, 0, 1))
    qv = q_l.T                                            # (N, nx)
    xnext = xnext_l.T                                     # (N, nx)
    u = xu[:, nx:]

    defect = x[1:] - xnext[:-1]
    c = jnp.concatenate([(x[0] - xs)[None], defect], axis=0)

    R = jnp.broadcast_to(
        cost.r_cost * jnp.eye(nq, dtype=dtype), (N - 1, nq, nq)
    )
    r = cost.r_cost * u[: N - 1]
    return KKTBlocks(Q=Q, q=qv, R=R, r=r, A=A, B=B, c=c)


# ---------------------------------------------------------------------------
# fused KKT + Schur condensation (+ lane-layout outputs for the PCG kernel)
# ---------------------------------------------------------------------------


def _mvn(M, v):
    """(n,n,B) @ (n,B) matvec."""
    n = M.shape[1]
    acc = M[:, 0, :] * v[0:1, :]
    for j in range(1, n):
        acc = acc + M[:, j, :] * v[j : j + 1, :]
    return acc


def _mvn_T(M, v):
    """M^T @ v for M (n,n,B): out[i] = sum_j M[j,i] v[j]."""
    n = M.shape[0]
    acc = M[0, :, :] * v[0:1, :]
    for j in range(1, n):
        acc = acc + M[j, :, :] * v[j : j + 1, :]
    return acc


def _mmn_bt(Ma, Mb, n):
    """Ma @ Mb^T for (n,n,B) operands: out[i,l] = sum_j Ma[i,j] Mb[l,j]."""
    cols = []
    for l in range(n):
        acc = Ma[:, 0, :] * Mb[l : l + 1, 0, :]
        for j in range(1, n):
            acc = acc + Ma[:, j, :] * Mb[l : l + 1, j, :]
        cols.append(acc)
    return jnp.stack(cols, axis=1)


def _make_kkt_schur_kernel(nq: int, N: int, integrator_type: int,
                           gravity: float, qd_cost: float, r_cost: float,
                           angle_wrap: bool = False, knots: int | None = None,
                           boundary_masks: bool = False):
    """KKT assembly + Schur condensation + stair preconditioner, one kernel.

    Emits (S, Pinv, gamma) DIRECTLY in the lane layout the PCG kernel wants
    (ops/pcg_pallas.py), plus the blocks dz recovery needs.  Math mirrors
    ops/schur.py::form_schur_system exactly; R + rho*I is diagonal
    ((r_cost + rho) I), so its inverse is the scalar 1/(r_cost + rho) —
    the reference inverts it with Gauss-Jordan anyway
    (pcg/linsys_setup.cuh:357-369).

    ``N`` is the LANE count; ``knots`` (default N) the per-instance horizon.
    When N = I * knots, lanes pack I problem instances side by side (the
    batched grid path, parallel/batched.py): every per-knot boundary mask is
    a function of k_local = lane %% knots, and the lane rolls that realize
    k-1 / k+1 coupling wrap across instance boundaries only where those
    masks are zero — the same trick as the ring halo in pcg_sharded.py.

    ``boundary_masks=True`` (the knot-SHARDED slab path,
    parallel/sqp_sharded.py): the global-first/global-last knot positions are
    not derivable from the lane index — the slab is an arbitrary window of
    the horizon with halo lanes at both ends — so the kernel takes them as a
    RUNTIME (2, N) input row (row 0 = 1.0 at the global first knot's lane,
    row 1 = 1.0 at the global last knot's lane) inserted after rho."""
    nx = 2 * nq
    knots = N if knots is None else knots
    launder = N > 128

    def kernel(xu_ref, xeval_ref, goal_ref, rho_ref, *rest):
        if boundary_masks:
            bmask_ref, dt_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            bmask_ref, dt_ref = None, rest[0]
            rest = rest[1:]
        (xc_ref, xsin_ref, xcos_ref, I_ref, hc_ref, hsin_ref, hcos_ref,
         S_ref, P_ref, gam_ref, Qinv_ref, A_ref, Bm_ref, qv_ref,
         *scratch) = rest
        dt = dt_ref[0]
        # rho rides a (1, N) VMEM row (an SMEM scalar cannot carry a vmap
        # batch dim; this layout keeps the kernel vmappable per instance)
        rho_row = rho_ref[:]                          # (1, N)
        rho3 = rho_row[None]                          # (1, 1, N)
        Amat, Bmat, Qmat, grad, xnext, Minv, qdd, dqdd = _kkt_core(
            xu_ref, xeval_ref, goal_ref, dt,
            xc_ref, xsin_ref, xcos_ref, I_ref, hc_ref, hsin_ref, hcos_ref,
            nq, N, integrator_type, gravity, qd_cost, angle_wrap,
            crba_scr=scratch[0] if launder else None)
        dtype = Amat.dtype
        u = xu_ref[nx : nx + nq, :]
        x_cur = xu_ref[0:nx, :]

        rowx = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, N), 0)
        colx = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, N), 1)
        eyex = (rowx == colx).astype(dtype)
        if boundary_masks:
            # runtime global-first/global-last lanes; (1, N) and (1, 1, N)
            # rows broadcast in arithmetic exactly like rho_row/s_r below
            n0v = 1.0 - bmask_ref[0:1, :]
            nlv = 1.0 - bmask_ref[1:2, :]
            not0 = n0v[None]
            notl = nlv[None]
        else:
            kmat = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, N), 2)
            kvec = jax.lax.broadcasted_iota(jnp.int32, (nx, N), 1)
            if knots != N:
                kmat = jax.lax.rem(kmat, jnp.int32(knots))  # per-instance knot
                kvec = jax.lax.rem(kvec, jnp.int32(knots))
            not0 = (kmat >= 1).astype(dtype)
            notl = (kmat <= knots - 2).astype(dtype)
            n0v = (kvec >= 1).astype(dtype)

        s_r = 1.0 / (r_cost + rho_row)                # (R+rho I)^{-1}, (1, N)
        s_r3 = s_r[None]                              # (1, 1, N)
        # (Q + rho I)^{-1} in CLOSED FORM: the ee-mode cost Hessian is the
        # rank-1 Gauss-Newton outer product gq gq^T on the position block
        # and (qd_cost) I on the velocity block (iiwa_eepos_plant.cuh:
        # 295-378), so Sherman-Morrison gives
        #   (rho I + gq gq^T)^{-1} = (1/rho)(I - gq gq^T / (rho + |gq|^2))
        # exactly — ~10 lane ops instead of an unrolled 28x28 inverse (the
        # reference Gauss-Jordans the full block, pcg/linsys_setup.cuh:
        # 357-369; the math is identical).
        gq = grad[0:nq, :]                            # (nq, N)
        gq2 = gq[0:1, :] * gq[0:1, :]
        for _i in range(1, nq):
            gq2 = gq2 + gq[_i : _i + 1, :] * gq[_i : _i + 1, :]
        inv_rho = 1.0 / rho_row                       # (1, N)
        sm = inv_rho / (rho_row + gq2)                # (1, N)
        qq = gq[:, None, :] * gq[None, :, :]          # (nq, nq, N)
        eyeq3 = (jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (nq, nq, N), 1)
                 ).astype(dtype)
        q_tl = inv_rho[None] * eyeq3 - sm[None] * qq  # (nq, nq, N)
        s_qd = 1.0 / (qd_cost + rho_row)              # (1, N)
        zq = jnp.zeros((nq, nq, N), dtype)
        Qinv = jnp.concatenate([
            jnp.concatenate([q_tl, zq], axis=1),
            jnp.concatenate([zq, s_qd[None] * eyeq3], axis=1),
        ], axis=0)                                    # (nx, nx, N)

        AQ = _mmn(Amat, Qinv, nx)                     # A_k Qr_k^{-1} at lane k
        AQAT = _mmn_bt(AQ, Amat, nx)
        MM = _mmn_bt(Minv, Minv, nq)                  # Minv Minv^T (7,7,N)
        # B Rr^{-1} B^T = s_r * dt^2 * [[0,0],[0, MM]]  (B = [0; dt Minv];
        # semi-implicit B = [dt^2 Minv; dt Minv] adds more blocks)
        if integrator_type == 0:
            brbt = jnp.concatenate([
                jnp.zeros((nq, nx, N), dtype),
                jnp.concatenate([jnp.zeros((nq, nq, N), dtype),
                                 (dt * dt) * (s_r3 * MM)], axis=1),
            ], axis=0)
        else:
            d2 = dt * dt
            sMM = s_r3 * MM
            brbt = jnp.concatenate([
                jnp.concatenate([d2 * d2 * sMM, d2 * dt * sMM], axis=1),
                jnp.concatenate([d2 * dt * sMM, dt * dt * sMM], axis=1),
            ], axis=0)
        T = AQAT + brbt                               # theta contribution of lane k -> k+1

        theta = Qinv + not0 * pltpu.roll(T, 1, axis=2)
        phi = -not0 * pltpu.roll(AQ, 1, axis=2)       # block (k, k-1)
        QA_T = _mmn_bt(Qinv, Amat, nx)                # Qinv_k A_k^T = (AQ_k)^T
        phiT = -notl * QA_T                           # block (k, k+1)

        # gamma (ops/schur.py:94-101); c_0 excluded by construction
        defect = x_cur - pltpu.roll(xnext, 1, axis=1)           # c_k, valid k >= 1
        aqq = _mvn(AQ, grad)                                    # AQ_k q_k
        bu = jnp.concatenate(
            [jnp.zeros((nq, N), dtype), dt * _mvn(Minv, u)], axis=0
        ) if integrator_type == 0 else jnp.concatenate(
            [dt * dt * _mvn(Minv, u), dt * _mvn(Minv, u)], axis=0
        )
        brr = (r_cost * s_r) * bu                               # B Rr^{-1} r_k
        gamma = _mvn(Qinv, grad) - n0v * (
            defect + pltpu.roll(aqq, 1, axis=1) + pltpu.roll(brr, 1, axis=1)
        )

        # symmetric-stair preconditioner (ops/schur.py:120-131)
        D = _gj_inverse_lanes(theta, nx)
        left = -not0 * _mmn(_mmn(D, phi, nx), pltpu.roll(D, 1, axis=2), nx)
        right = -notl * _mmn(_mmn(D, phiT, nx), pltpu.roll(D, N - 1, axis=2), nx)
        # (roll by N-1 = lane k+1; instance-boundary wraps are masked by notl)

        S_ref[0] = phi
        S_ref[1] = theta
        S_ref[2] = phiT
        P_ref[0] = left
        P_ref[1] = D
        P_ref[2] = right
        gam_ref[:] = gamma
        Qinv_ref[:] = Qinv
        A_ref[:] = Amat
        Bm_ref[:] = Bmat
        qv_ref[:] = grad

    return kernel


@highest_precision
@partial(jax.jit, static_argnames=("cost", "integrator_type", "interpret",
                                   "angle_wrap"))
def build_kkt_schur_pallas(
    model: RobotModel, cost: CostConfig, xu, xs, ee_goal, rho, dt,
    integrator_type: int = 0, interpret: bool = False,
    angle_wrap: bool = False,
):
    """One kernel: KKT blocks -> (S, Pinv, gamma) + dz inputs, lane layout.

    Returns a dict with lane-packed arrays:
      S, Pinv (3, nx, nx, N); gamma (nx, N); Qinv (nx, nx, N);
      A (nx, nx, N); B (nx, nq, N); q (nx, N); plus scalars dt/rho echoes.
    Feed S/Pinv/gamma straight to ops.pcg_pallas.pcg_solve_pallas_lanes.
    """
    if cost.mode != "ee":
        raise ValueError("pallas KKT+Schur kernel supports ee cost mode only")
    nq = model.nq
    nx = 2 * nq
    N = xu.shape[0]
    dtype = xu.dtype

    x = xu[:, :nx]
    x_eval = x if cost.terminal_at_last_state else x.at[N - 1].set(x[N - 2])
    rho_row = jnp.broadcast_to(jnp.asarray(rho, dtype), (1, N))
    dt_arr = jnp.asarray([dt], dtype)

    S, P, gamma, Qinv, A, B, qv = pl.pallas_call(
        _make_kkt_schur_kernel(nq, N, integrator_type, float(model.gravity),
                               float(cost.qd_cost), float(cost.r_cost),
                               angle_wrap),
        out_shape=(
            jax.ShapeDtypeStruct((3, nx, nx, N), dtype),
            jax.ShapeDtypeStruct((3, nx, nx, N), dtype),
            jax.ShapeDtypeStruct((nx, N), dtype),
            jax.ShapeDtypeStruct((nx, nx, N), dtype),
            jax.ShapeDtypeStruct((nx, nx, N), dtype),
            jax.ShapeDtypeStruct((nx, nq, N), dtype),
            jax.ShapeDtypeStruct((nx, N), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)),
        scratch_shapes=(
            [pltpu.VMEM((nq, 6, N), dtype)] if N > 128 else []),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(xu.T, x_eval.T, ee_goal[:, :3].T, rho_row, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)
    return dict(S=S, Pinv=P, gamma=gamma, Qinv=Qinv, A=A, B=B, q=qv)


@highest_precision
@partial(jax.jit, static_argnames=("cost", "integrator_type", "interpret",
                                   "angle_wrap"))
def build_kkt_schur_pallas_slab(
    model: RobotModel, cost: CostConfig, xu_ext, x_eval_ext, ee_goal_ext,
    first_mask, last_mask, rho, dt,
    integrator_type: int = 0, interpret: bool = False,
    angle_wrap: bool = False,
):
    """Fused KKT+Schur+stair on a horizon SLAB with halo lanes — the
    shard-local kernel of the knot-sharded SQP (parallel/sqp_sharded.py).

    xu_ext (Lext, nx+nu) is one shard's slab extended with halo knots from
    its ring neighbors (2 on each side: the stair preconditioner's
    D_{k-1} = theta_{k-1}^{-1} needs T_{k-2}, a two-hop dependency).
    first_mask / last_mask (Lext,) mark the GLOBAL first/last knot lanes
    (all-zero on interior shards); they replace the lane-position boundary
    masks of build_kkt_schur_pallas, so slab-interior rows compute exactly
    the global S/Pinv/gamma and halo-lane outputs are discarded by the
    caller.  The terminal x_eval substitution (x_{N-1} -> x_{N-2},
    config.py terminal quirk) is the caller's job, as in the batched path.
    """
    if cost.mode != "ee":
        raise ValueError("pallas KKT+Schur kernel supports ee cost mode only")
    nq = model.nq
    nx = 2 * nq
    Lext = xu_ext.shape[0]
    dtype = xu_ext.dtype
    rho_row = jnp.broadcast_to(jnp.asarray(rho, dtype), (1, Lext))
    bmask = jnp.stack([first_mask.astype(dtype), last_mask.astype(dtype)])
    dt_arr = jnp.asarray([dt], dtype)

    S, P, gamma, Qinv, A, B, qv = pl.pallas_call(
        _make_kkt_schur_kernel(nq, Lext, integrator_type,
                               float(model.gravity), float(cost.qd_cost),
                               float(cost.r_cost), angle_wrap,
                               boundary_masks=True),
        out_shape=(
            jax.ShapeDtypeStruct((3, nx, nx, Lext), dtype),
            jax.ShapeDtypeStruct((3, nx, nx, Lext), dtype),
            jax.ShapeDtypeStruct((nx, Lext), dtype),
            jax.ShapeDtypeStruct((nx, nx, Lext), dtype),
            jax.ShapeDtypeStruct((nx, nx, Lext), dtype),
            jax.ShapeDtypeStruct((nx, nq, Lext), dtype),
            jax.ShapeDtypeStruct((nx, Lext), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)),
        scratch_shapes=(
            [pltpu.VMEM((nq, 6, Lext), dtype)] if Lext > 128 else []),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(xu_ext.T, x_eval_ext.T, ee_goal_ext[:, :3].T, rho_row, bmask, dt_arr,
      model.xc, model.xs, model.xcos, model.inertia,
      model.hc, model.hs, model.hcos)
    return dict(S=S, Pinv=P, gamma=gamma, Qinv=Qinv, A=A, B=B, q=qv)


def dz_from_lane_values(lam, lam_n, notl, notlq, Qinv, A, Bm, qv, u,
                        rho_row, r_cost):
    """dz recovery math on lane-layout VALUES (dz.cuh:10-34 equivalent):
    dx = Qinv (q - lam + A^T lam_+), du = (R+rho I)^{-1} (r + B^T lam_+).
    Shared by the standalone dz kernel and the PCG+dz fused epilogue."""
    rhs = qv - lam + _mvn_T(A, lam_n) * notl
    dx = _mvn(Qinv, rhs)
    s_r = 1.0 / (r_cost + rho_row)
    bt = _mvn_T(Bm, lam_n)
    du = s_r * (r_cost * u + bt) * notlq
    return jnp.concatenate([dx, du], axis=0)


def dz_lane_masks(nq: int, N: int, knots: int, dtype):
    """(notl (nx, N), notlq (nq, N)) float masks zeroing the global-last
    knot's lam_{k+1} term and du (dz.cuh:15-19), iota-based (single-chip /
    packed-instance layouts; the slab path feeds runtime masks instead)."""
    nx = 2 * nq
    kvec = jax.lax.broadcasted_iota(jnp.int32, (nx, N), 1)
    kq = jax.lax.broadcasted_iota(jnp.int32, (nq, N), 1)
    if knots != N:                                  # packed instances
        kvec = jax.lax.rem(kvec, jnp.int32(knots))
        kq = jax.lax.rem(kq, jnp.int32(knots))
    return ((kvec <= knots - 2).astype(dtype), (kq <= knots - 2).astype(dtype))


def _make_dz_kernel(nq: int, N: int, knots: int | None = None,
                    boundary_masks: bool = False):
    nx = 2 * nq
    knots = N if knots is None else knots

    def kernel(lam_ref, *rest):
        if boundary_masks:
            # slab mode (parallel/sqp_sharded.py): lam_{k+1} arrives as a
            # separate input (the shard exchanged its right halo already)
            # and the global-last mask is a runtime (1, N) row
            lamn_ref, lastm_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            lamn_ref = lastm_ref = None
            rest = rest
        (Qinv_ref, A_ref, Bm_ref, qv_ref, u_ref, rho_ref,
         scal_ref, dz_ref) = rest
        r_cost = scal_ref[0]
        rho_row = rho_ref[:]                                # (1, N)
        lam = lam_ref[:]                                    # (nx, N)
        if boundary_masks:
            notl = 1.0 - lastm_ref[:]                       # (1, N)
            notlq = notl
            lam_n = lamn_ref[:] * notl
        else:
            notl, notlq = dz_lane_masks(nq, N, knots, lam.dtype)
            lam_n = pltpu.roll(lam, N - 1, axis=1) * notl   # lam_{k+1}, 0 at N-1
        dz_ref[:] = dz_from_lane_values(
            lam, lam_n, notl, notlq, Qinv_ref[:], A_ref[:], Bm_ref[:],
            qv_ref[:], u_ref[:], rho_row, r_cost)

    return kernel


@highest_precision
@partial(jax.jit, static_argnames=("interpret",))
def compute_dz_pallas(lane_kkt: dict, lam, u, rho, r_cost,
                      interpret: bool = False):
    """dz recovery from lane-packed blocks (include/common/dz.cuh equivalent).

    lam: (N, nx) costate solve; u: (N, nq) controls. Returns dz (N, nx+nq).
    """
    Qinv = lane_kkt["Qinv"]
    nx, _, N = Qinv.shape
    nq = nx // 2
    dtype = Qinv.dtype
    rho_row = jnp.broadcast_to(jnp.asarray(rho, dtype), (1, N))
    scal = jnp.asarray([r_cost], dtype)
    dz_l = pl.pallas_call(
        _make_dz_kernel(nq, N),
        out_shape=jax.ShapeDtypeStruct((nx + nq, N), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(lam.T, Qinv, lane_kkt["A"], lane_kkt["B"], lane_kkt["q"], u.T, rho_row, scal)
    return dz_l.T


@highest_precision
@partial(jax.jit, static_argnames=("interpret",))
def compute_dz_pallas_slab(lane_kkt: dict, lam, lam_next, last_mask, u, rho,
                           r_cost, interpret: bool = False):
    """dz recovery on one knot shard's slab (parallel/sqp_sharded.py).

    lam (L, nx) is the shard's costate rows; lam_next (L, nx) is lam shifted
    one knot left with the RIGHT neighbor's first row appended (the shard
    exchanged that halo already); last_mask (L,) marks the global last knot
    (its lam_{k+1} and du are structurally zero, dz.cuh:15-19).
    """
    Qinv = lane_kkt["Qinv"]
    nx, _, L = Qinv.shape
    nq = nx // 2
    dtype = Qinv.dtype
    rho_row = jnp.broadcast_to(jnp.asarray(rho, dtype), (1, L))
    scal = jnp.asarray([r_cost], dtype)
    lastm = last_mask.astype(dtype).reshape(1, L)
    dz_l = pl.pallas_call(
        _make_dz_kernel(nq, L, boundary_masks=True),
        out_shape=jax.ShapeDtypeStruct((nx + nq, L), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(lam.T, lam_next.T, lastm, Qinv, lane_kkt["A"], lane_kkt["B"],
      lane_kkt["q"], u.T, rho_row, scal)
    return dz_l.T
