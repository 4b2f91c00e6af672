#!/usr/bin/env python3
"""On-TPU COMPILED-kernel smoke pass (VERDICT r2 item 4).

Every Pallas kernel's equality test in tests/ runs interpret-mode on CPU
(tests/conftest.py), so compiled Mosaic correctness on real hardware was only
exercised implicitly by benchmarks at the tuned horizons — and one flag flip
(the N>128 laundered CRBA path) already produced a silent wrong-answer class
in round 1.  This script runs every kernel COMPILED on the real chip at every
tuned horizon and checks it against its XLA twin, in one command:

    python tools/tpu_smoke.py [--knots 32 64 128 256 512] [--skip-slow]

Covers: KKT kernel, fused KKT+Schur+stair, lane PCG, dz, merit, plant step,
PCR, the batched gridded pipeline, and the shard-local slab kernel (2-shard
split vs the full kernel).  Prints one PASS/FAIL line per (kernel, N) and
exits nonzero on any failure.

NOTE: first compile of the big fused kernels at N>=256 takes ~6 min each
(Mosaic); set JAX_COMPILATION_CACHE_DIR (bench.py default) to amortize.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check_residual(name, N, S, b, got, want, ratio=3.0, abs_cap=None):
    """Residual-quality check for iterative / few-digit direct solves.

    Elementwise x-equality is the wrong criterion for (a) cap-bound
    unconverged CG (arithmetic-order divergence compounds over 100+
    iterations — measured identical residuals with max|dx| ~ 1e-3 at
    N=64/167 iters) and (b) f32 PCR on cond ~1e5-1e6 Schur systems (both
    twins keep 1-2 digits; ops/pcr_pallas.py docstring).  The meaningful
    compiled-kernel criterion is solution QUALITY: require the pallas
    relative residual to be finite and within `ratio` of the XLA twin's."""
    from mpcgpu_tpu.ops.btd import btd_matvec
    got64 = np.asarray(got, np.float64)
    b64 = np.asarray(b, np.float64)
    gn = max(float(np.linalg.norm(b64)), 1e-30)
    r_got = float(np.linalg.norm(b64 - np.asarray(btd_matvec(S, got), np.float64))) / gn
    r_want = float(np.linalg.norm(b64 - np.asarray(btd_matvec(S, want), np.float64))) / gn
    ok = np.isfinite(got64).all() and r_got <= ratio * max(r_want, 1e-12)
    # optional absolute ceiling (ADVICE r4): a ratio alone passes silently
    # if BOTH twins degrade together, or if the pallas side regresses up to
    # ratio x a small xla residual — cap the pallas relres outright too.
    if abs_cap is not None:
        ok = ok and r_got <= abs_cap
    cap_s = "" if abs_cap is None else f", abs<={abs_cap}"
    print(f"{'PASS' if ok else 'FAIL'}  {name:28s} N={N:<4d} relres={r_got:.3e} "
          f"(xla {r_want:.3e}, ratio<={ratio}{cap_s})", flush=True)
    if not ok:
        FAILURES.append((name, N))


def check(name, N, got, want, atol_scale=2e-5):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    scale = max(float(np.max(np.abs(want))), 1.0)
    ok = np.isfinite(got).all() and np.allclose(got, want, atol=atol_scale * scale)
    err = float(np.max(np.abs(got - want))) if got.shape == want.shape else float("nan")
    print(f"{'PASS' if ok else 'FAIL'}  {name:28s} N={N:<4d} max|d|={err:.3e} "
          f"(scale {scale:.1e})", flush=True)
    if not ok:
        FAILURES.append((name, N))


def problem(N, dtype=jnp.float32):
    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    xu_full = load_xu_traj("0_0")
    reps = int(np.ceil(N / xu_full.shape[0]))
    xu = jnp.asarray(np.tile(xu_full, (reps, 1))[:N], dtype)
    ee = jnp.asarray(np.tile(load_eepos_traj("0_0"), (reps, 1))[:N], dtype)
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    return model, cost, xu, ee


def run_for_knots(N, skip_slow=False):
    from mpcgpu_tpu.config import PCGConfig
    from mpcgpu_tpu.ops.pcg import pcg_solve
    from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas
    from mpcgpu_tpu.ops.schur import compute_dz, form_schur_system
    from mpcgpu_tpu.solver.kkt import build_kkt
    from mpcgpu_tpu.solver.kkt_pallas import (build_kkt_pallas,
                                              build_kkt_schur_pallas,
                                              compute_dz_pallas)
    from mpcgpu_tpu.solver.merit import line_search_merits
    from mpcgpu_tpu.solver.merit_pallas import line_search_merits_pallas

    model, cost, xu, ee = problem(N)
    xs = xu[0, :14]
    rho = jnp.float32(1e-3)
    dt = 1.0 / 64.0
    t0 = time.time()

    # --- KKT kernel vs XLA twin ---
    kkt_p = build_kkt_pallas(model, cost, xu, xs, ee, dt)
    kkt_x = build_kkt(model, cost, xu, xs, ee, dt)
    for f in ("Q", "q", "A", "B", "c"):
        check(f"kkt.{f}", N, getattr(kkt_p, f), getattr(kkt_x, f))

    # --- fused KKT+Schur+stair vs XLA twins ---
    lane = build_kkt_schur_pallas(model, cost, xu, xs, ee, rho, dt)
    schur = form_schur_system(kkt_x, rho)
    check("schur.S", N, jnp.transpose(lane["S"], (3, 0, 1, 2)), schur.S)
    check("schur.Pinv", N, jnp.transpose(lane["Pinv"], (3, 0, 1, 2)), schur.Pinv,
          atol_scale=3e-5)
    check("schur.gamma", N, lane["gamma"].T, schur.gamma)

    # --- PCG kernel vs XLA while-loop PCG (f32 CG on cond~1e5: compare
    # converged solutions at a realistic tolerance) ---
    lam0 = jnp.zeros_like(schur.gamma)
    cap = PCGConfig.tuned_max_iter(N)
    res_p = pcg_solve_pallas(schur.S, schur.Pinv, schur.gamma, lam0,
                             max_iter=cap, exit_tol=1e-7)
    res_x = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0,
                      max_iter=cap, exit_tol=1e-7)
    check("pcg.lam", N, res_p.lam, res_x.lam, atol_scale=5e-4)
    print(f"      pcg iters: pallas={int(res_p.iters)} xla={int(res_x.iters)}")

    # --- dz kernel ---
    dz_p = compute_dz_pallas(lane, res_x.lam, xu[:, 14:], rho, cost.r_cost)
    dz_x = compute_dz(kkt_x, schur, res_x.lam)
    # 5e-5 rel gate: same-lam twin; measured compiled f32 accumulation-order
    # noise peaks at 2.3e-5 rel at N=512 (queue r5 smoke_full2).
    check("dz", N, dz_p, dz_x, atol_scale=5e-5)

    # --- fused PCG+dz epilogue kernel (round 4, opt-in fused_dz path) ---
    from mpcgpu_tpu.ops.pcg_pallas import pcg_dz_solve_pallas_lanes

    lam0_l = jnp.zeros_like(lane["gamma"])
    lam_l, dz_f, it_f, _ = pcg_dz_solve_pallas_lanes(
        lane, lane["gamma"], lam0_l, xu[:, 14:], rho, cost.r_cost,
        max_iter=cap, exit_tol=1e-7)
    check("pcg_dz.lam", N, lam_l.T, res_x.lam, atol_scale=5e-4)
    # Twin-isolate the dz EPILOGUE: the fused kernel runs its own CG, whose
    # cap-bound lam differs from the XLA CG's by up to the 5e-4 lam gate, and
    # dz amplifies lam differences through Q^{-1} (~60x observed at N=128) —
    # so compare against XLA compute_dz applied to the fused kernel's OWN
    # lam, not to the XLA CG's lam (queue r5 smoke_full2 false FAIL).
    dz_x_fused_lam = compute_dz(kkt_x, schur, lam_l.T)
    check("pcg_dz.dz", N, dz_f, dz_x_fused_lam, atol_scale=5e-5)
    print(f"      pcg_dz iters: fused={int(it_f)}")

    # --- merit kernel ---
    m_p, _ = line_search_merits_pallas(model, cost, xu, dz_x, xs, ee,
                                       10.0, dt)
    m_x, _ = line_search_merits(model, cost, xu, dz_x, xs, ee, 10.0, dt,
                                include_zero=True)
    check("merit", N, m_p, m_x)

    # --- plant step kernel (sim/plant_pallas.py) ---
    try:
        from mpcgpu_tpu.sim.plant_pallas import simulate_plant_pallas
        from mpcgpu_tpu.sim.plant import simulate_plant

        sim_steps = 8
        x0 = xu[0, :14]
        u_seq = jnp.broadcast_to(xu[0, 14:], (sim_steps, 7))
        xp = simulate_plant_pallas(model, x0, u_seq, 2e-4)
        xx = simulate_plant(model, x0, u_seq, 2e-4)
        check("plant", N, xp, xx)
    except ImportError:
        pass

    # --- PCR kernel (parallel cyclic reduction) ---
    if not skip_slow:
        try:
            from mpcgpu_tpu.ops.pcr import pcr_solve_refined
            from mpcgpu_tpu.ops.pcr_pallas import pcr_solve_pallas

            sol_p = pcr_solve_pallas(schur.S, schur.gamma, refine=1)
            sol_x = pcr_solve_refined(schur.S, schur.gamma, refine=1)
            # Residual criterion: f32 PCR keeps 1-2 digits on these systems
            # (both twins; measured relres floors ~1e-2 xla / ~1e-1 lanes at
            # N=64 — the lane GJ inverse trails by a constant factor).
            check_residual("pcr", N, schur.S, schur.gamma, sol_p, sol_x,
                           ratio=25.0, abs_cap=0.3)
        except ImportError:
            pass

    print(f"      [{N=} done in {time.time() - t0:.1f}s]", flush=True)


def run_slab(N):
    """Compiled slab kernel (shard-local fused KKT+Schur of the knot-sharded
    SQP, kkt_pallas.build_kkt_schur_pallas_slab) vs the compiled full-horizon
    kernel: interior lanes of a 2-shard split must reproduce the global
    outputs (the compiled twin of tests/test_kkt_slab.py)."""
    from mpcgpu_tpu.solver.kkt_pallas import (build_kkt_schur_pallas,
                                              build_kkt_schur_pallas_slab)

    model, cost, xu, ee = problem(N)
    rho = jnp.float32(1e-3)
    dt = 1.0 / 64.0
    H = 2
    full = build_kkt_schur_pallas(model, cost, xu, xu[0, :14], ee, rho, dt)

    L = N // 2
    for s in range(2):
        lo, hi = s * L, (s + 1) * L
        idx = np.clip(np.arange(lo - H, hi + H), 0, N - 1)
        gpos = np.arange(lo - H, hi + H)
        xu_ext, ee_ext = xu[idx], ee[idx]
        first_m = jnp.asarray((gpos == 0).astype(np.float32))
        last_m = jnp.asarray((gpos == N - 1).astype(np.float32))
        x_ext = xu_ext[:, :14]
        if cost.terminal_at_last_state:
            x_eval_ext = x_ext
        else:
            x_prev = jnp.concatenate([x_ext[:1], x_ext[:-1]], axis=0)
            x_eval_ext = jnp.where((gpos == N - 1)[:, None], x_prev, x_ext)
        slab = build_kkt_schur_pallas_slab(
            model, cost, xu_ext, x_eval_ext, ee_ext, first_m, last_m, rho, dt)
        sl = slice(H, H + L)
        for key in ("S", "Pinv", "gamma"):
            check(f"slab[{s}].{key}", N, slab[key][..., sl],
                  full[key][..., lo:hi], atol_scale=3e-5)


def run_pcg_slab(N):
    """Compiled slab-step PCG kernel (ops/pcg_pallas.pcg_slab_step_pallas,
    driving parallel/pcg_sharded method='pipelined_slab') vs the XLA PCG, on
    a 1-device mesh (the chip): exercises the kernel + the packet/psum loop
    structure compiled; the multi-shard split is CPU-mesh-tested in
    tests/test_parallel.py."""
    from jax.sharding import Mesh
    from mpcgpu_tpu.config import PCGConfig
    from mpcgpu_tpu.ops.pcg import pcg_solve
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_sharded
    from mpcgpu_tpu.solver.kkt import build_kkt

    model, cost, xu, ee = problem(N)
    kkt = build_kkt(model, cost, xu, xu[0, :14], ee, 1.0 / 64.0)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros_like(schur.gamma)
    cap = PCGConfig.tuned_max_iter(N)
    mesh = Mesh(np.array(jax.devices()[:1]), ("knot",))
    got = pcg_solve_sharded(schur.S, schur.Pinv, schur.gamma, lam0, mesh,
                            max_iter=cap, exit_tol=1e-7,
                            method="pipelined_slab")
    want = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0,
                     max_iter=cap, exit_tol=1e-7)
    # Residual criterion: at tuned caps the 1e-7 target is unreachable, so
    # both runs are cap-bound and elementwise lam diverges ~1e-3 by pure
    # arithmetic order; measured residual quality is identical (CPU + TPU).
    check_residual("pcg_slab.lam", N, schur.S, schur.gamma, got.lam,
                   want.lam, ratio=1.25)
    print(f"      pcg_slab iters: slab={int(got.iters)} xla={int(want.iters)}")


def run_pcg_slab2(N):
    """Compiled TWO-slab slab-step PCG on one chip (VERDICT r4 weak #4):
    pcg_solve_two_slab drives the compiled pcg_slab_step_pallas kernel with
    NONTRIVIAL neighbor packets/injections (explicit 2-ring swaps replace
    the collectives), so the boundary-exchange path itself executes compiled
    — a 1-device mesh only ever feeds it self-contributions."""
    from mpcgpu_tpu.config import PCGConfig
    from mpcgpu_tpu.ops.pcg import pcg_solve
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_solve_two_slab
    from mpcgpu_tpu.solver.kkt import build_kkt

    model, cost, xu, ee = problem(N)
    kkt = build_kkt(model, cost, xu, xu[0, :14], ee, 1.0 / 64.0)
    schur = form_schur_system(kkt, 1e-3)
    lam0 = jnp.zeros_like(schur.gamma)
    cap = PCGConfig.tuned_max_iter(N)
    got = pcg_solve_two_slab(schur.S, schur.Pinv, schur.gamma, lam0,
                             max_iter=cap, exit_tol=1e-7)
    want = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0,
                     max_iter=cap, exit_tol=1e-7)
    check_residual("pcg_slab2.lam", N, schur.S, schur.gamma, got.lam,
                   want.lam, ratio=1.25)
    print(f"      pcg_slab2 iters: 2slab={int(got.iters)} "
          f"xla={int(want.iters)}")


def run_chain(N=32, nq=5):
    """nq-generic compiled check: a programmatic 5-dof chain (not the baked
    IIWA) through the fused KKT+Schur kernel and PCG vs the XLA twins —
    guards the nq-generic claim on silicon, not just in interpret mode."""
    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.models.chain import planar_arm
    from mpcgpu_tpu.ops.pcg import pcg_solve
    from mpcgpu_tpu.ops.pcg_pallas import pcg_solve_pallas
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.solver.kkt import build_kkt
    from mpcgpu_tpu.solver.kkt_pallas import build_kkt_schur_pallas

    dtype = jnp.float32
    model = planar_arm(nq=nq, dtype=dtype)
    cost = CostConfig()
    nx = 2 * nq
    key = jax.random.PRNGKey(3)
    xu = 0.3 * jax.random.normal(key, (N, nx + nq), dtype)
    ee = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.0, 0, 0, 0], dtype),
                          (N, 6))
    rho = jnp.float32(1e-3)
    dt = 1.0 / 64.0
    lane = build_kkt_schur_pallas(model, cost, xu, xu[0, :nx], ee, rho, dt)
    kkt = build_kkt(model, cost, xu, xu[0, :nx], ee, dt)
    schur = form_schur_system(kkt, rho)
    # 5e-4 scale: the random-state planar chain accumulates more f32
    # reassociation drift than the IIWA trace points — gamma measured
    # 3.9e-4 IDENTICALLY in interpret mode (so lane-order numerics, not a
    # Mosaic miscompile)
    check(f"chain{nq}.S", N, jnp.transpose(lane["S"], (3, 0, 1, 2)), schur.S,
          atol_scale=5e-4)
    check(f"chain{nq}.gamma", N, lane["gamma"].T, schur.gamma,
          atol_scale=5e-4)
    lam0 = jnp.zeros_like(schur.gamma)
    rp = pcg_solve_pallas(schur.S, schur.Pinv, schur.gamma, lam0,
                          max_iter=120, exit_tol=1e-7)
    rx = pcg_solve(schur.S, schur.Pinv, schur.gamma, lam0,
                   max_iter=120, exit_tol=1e-7)
    # random-chain Schur system is brutally conditioned: both runs are
    # cap-bound (relres ~0.76 at 120 iters) -> residual criterion
    check_residual(f"chain{nq}.pcg", N, schur.S, schur.gamma, rp.lam,
                   rx.lam, ratio=1.25)


def run_batched(skip_slow=False):
    """Batched gridded fused pipeline vs vmapped unfused (N=32, I=4)."""
    from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
    from mpcgpu_tpu.parallel.batched import make_batched_sqp_solver

    N, B = 32, 8
    model, cost, xu, ee = problem(N)
    xu_b = jnp.broadcast_to(xu, (B,) + xu.shape)
    xs_b = xu_b[:, 0, :14]
    ee_b = jnp.broadcast_to(ee, (B,) + ee.shape)
    lam_b = jnp.zeros((B, N, 14), jnp.float32)
    rho_b = jnp.full((B,), 1e-3, jnp.float32)
    scfg = SQPConfig(max_iter=2)
    pcfg = PCGConfig(max_iter=40, exit_tol=1e-6)
    fused = make_batched_sqp_solver(model, cost, scfg, pcfg, 1 / 64.0,
                                    fused=True, donate=False)
    unfused = make_batched_sqp_solver(model, cost, scfg, pcfg, 1 / 64.0,
                                      fused=False, donate=False)
    rf = fused(xu_b, lam_b, xs_b, ee_b, rho_b)
    ru = unfused(xu_b, lam_b, xs_b, ee_b, rho_b)
    check("batched_fused.xu", N, rf.xu, ru.xu, atol_scale=5e-4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, nargs="+",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip PCR and the batched pipeline")
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})")
    if backend != "tpu":
        print("WARNING: not on TPU — kernels will run in interpret mode "
              "only if callers force it; this pass is meant for the chip")

    for N in args.knots:
        run_for_knots(N, skip_slow=args.skip_slow)
    if not args.skip_slow:
        run_batched()
        # slab kernels at a short and a laundered-path (>128-lane) length
        for N in (64, 256):
            if max(args.knots) >= N:
                run_slab(N)
        for N in (64,):
            if max(args.knots) >= N:
                run_pcg_slab(N)
        # compiled 2-slab boundary-exchange coverage at a short and a
        # laundered-path (>128-lane global) horizon
        for N in (64, 256):
            if max(args.knots) >= N:
                run_pcg_slab2(N)
        run_chain()

    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall compiled-kernel checks passed")


if __name__ == "__main__":
    main()
