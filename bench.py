#!/usr/bin/env python3
"""Headline benchmark: PCG-SQP iteration latency, IIWA N=64, one TPU chip.

Measures one FULL SQP iteration (KKT assembly -> Schur + stair preconditioner
-> PCG -> dz recovery -> 8-alpha line search -> iterate update) against the
reference's real-time budget of SQP_MAX_TIME_US = 2000 us per control step
(settings.cuh:161-163, BASELINE.md).

Methodology: K control steps of a realistic warm-started MPC chain run INSIDE
one jitted program (`lax.fori_loop`); each step shifts the goal trajectory
and warm start by one knot and advances the initial state, exactly like the
closed-loop tracker's shift logic (mpcsim.cuh:297-347), so every solve does
real work (PCG runs tens of iterations, as in the reference's steady state).

Two chain lengths are timed (K_LO=256 and K_HI=768 over the SAME trajectory
prefix) and the headline is the DIFFERENCE divided by the extra steps: the
per-call host<->device dispatch cost cancels exactly, leaving the
steady-state per-control-step device latency of steps 256..767.  This
matters on the tunneled dev setup: the per-call cost of the full chain
program is ~26 ms (measured round 5; argument/program staging through the
relay — a trivial jit's round trip is only ~0.1 ms), so the round-1..5
single-K numbers carried ~26 ms/256 = ~100 us/step of infrastructure
pollution.  The two-K slope was validated against a jax.profiler DEVICE
trace: trace 132.6 us/step vs slope 131.5 us/step at the N=64 tuned cap
(round 5, RESULTS stage=slope_methodology).  On locally-attached hardware
(the deployment topology, and how the reference's GPU timers measure)
dispatch is microseconds and the slope is the number a user gets.

Prints ONE JSON line: value = per-solve steady-state latency in
microseconds (two-K slope); wall_k256_us = the legacy single-K wall number
(includes the tunnel artifact, kept for round-over-round continuity);
vs_baseline = 2000 / value (speedup vs the 2 ms real-time budget; > 1
means real-time with headroom).
"""

import json
import os
import signal
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

# NO top-level `import jax` here: when the TPU tunnel is wedged, the axon
# plugin BLOCKS INSIDE `import jax` (uninterruptible, in C) — a top-level
# import would hang the GUARD process itself before the subprocess probe
# ever runs, defeating the whole watchdog (observed live, round 5).  jax is
# imported only inside the worker paths (main()), which run as killable
# children under run_guarded.

METRIC = "sqp_pcg_iteration_latency_iiwa_n64"


def emit_unavailable(reason):
    """One machine-readable JSON line when the TPU backend is unreachable.

    The remote-TPU tunnel has documented multi-hour outages (verify skill);
    a raw traceback here breaks the round-over-round BENCH_r* record
    (VERDICT r3 weak #2), so failures must stay on the same one-line JSON
    contract as success.
    """
    print(json.dumps(dict(
        metric=METRIC, value=None, unit="us", vs_baseline=None,
        error="tpu_unavailable", reason=str(reason)[:400],
    )))


class _BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _BenchTimeout("watchdog alarm fired")


def _subprocess_probe():
    """One trivial-jit probe in a CHILD process.

    A wedged tunnel blocks inside the backend's C extension without
    returning to the interpreter, so in-process SIGALRM never fires
    (observed live, round 4) — only a killable child is a reliable probe.
    """
    import subprocess
    import sys

    timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "120"))
    code = ("import jax, jax.numpy as jnp; "
            "jax.block_until_ready(jax.jit(lambda a: a.sum())"
            "(jnp.ones((8, 128)))); print('ok')")
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout_s)
    if res.returncode != 0:
        raise RuntimeError(f"backend probe failed: {res.stderr[-300:]}")


def probe_backend(attempts=None, retry_sleep_s=None, _probe_fn=None):
    """Bounded probe/retry window for the TPU backend.

    Returns None on success; raises the last failure after `attempts` tries.
    `_probe_fn` is injectable for tests (default: a killable subprocess
    probe, see _subprocess_probe).
    """
    if attempts is None:
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    if retry_sleep_s is None:
        retry_sleep_s = float(os.environ.get("BENCH_PROBE_RETRY_S", "60"))

    probe = _probe_fn or _subprocess_probe
    last = None
    for k in range(attempts):
        try:
            probe()
            return
        except Exception as e:  # noqa: BLE001 - backend errors vary by plugin
            last = e
        if k + 1 < attempts:
            time.sleep(retry_sleep_s)
    raise last


def main(repeats: int = 0):
    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
    from mpcgpu_tpu.solver.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj
    from mpcgpu_tpu.models import iiwa14

    N = 64
    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    cost = CostConfig.for_knots(N)
    pcg_cfg = PCGConfig(max_iter=PCGConfig.tuned_max_iter(N), exit_tol=1e-5)
    sqp_cfg = SQPConfig(max_iter=1)

    # full recorded trace: the goal window slides along it each control step
    ee_full = jnp.asarray(load_eepos_traj("0_0"), dtype)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], dtype)
    ee0 = ee_full[:N]
    xu = xu + 0.01 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, dtype)
    xs = xu[0, :14]
    lam = jnp.zeros((N, 14), dtype)
    rho = jnp.asarray(1e-3, dtype)

    linsys = "pcg_pallas" if jax.default_backend() == "tpu" else "pcg"
    K = 256        # legacy single-K window (wall numbers, rounds 1-5)
    K_HI = 768     # slope window: steps K..K_HI-1, dispatch cost cancels

    def make_chain(linsys, pcg_cfg, fused_dz=True, k=K):
        # fused_dz=True is the LIBRARY DEFAULT (solver/sqp.py) — the
        # headline measures the shipped configuration; the split-dz
        # variant is reported alongside as `split_dz_us`.
        @jax.jit
        def chain(xu0, lam0, xs0, ee0, rho0):
            def body(i, carry):
                xu_, lam_, xs_, ee_, rho_, iters = carry
                res = sqp_solve(
                    model, cost, sqp_cfg, pcg_cfg, xu_, lam_, xs_, ee_, rho_,
                    1.0 / 64.0, linsys=linsys, fused_dz=fused_dz,
                )
                # MPC shift (mpcsim.cuh:297-347): advance one knot, backfill
                # the tail, move the goal window along the recorded trace
                xu_n = jnp.roll(res.xu, -1, axis=0).at[-1].set(res.xu[-1])
                lam_n = jnp.roll(res.lam, -1, axis=0).at[-1].set(res.lam[-1])
                xs_n = res.xu[1, :14]
                ee_n = jnp.roll(ee_, -1, axis=0).at[-1].set(
                    jax.lax.dynamic_index_in_dim(
                        ee_full, (i + N) % ee_full.shape[0], keepdims=False
                    )
                )
                return (xu_n, lam_n, xs_n, ee_n, res.rho, iters + res.pcg_iters[0])

            init = (xu0, lam0, xs0, ee0, rho0, jnp.int32(0))
            return jax.lax.fori_loop(0, k, body, init)

        return chain

    def run(linsys, pcg_cfg, fused_dz=True):
        """Two-K slope timing of one variant.

        Returns (slope_us, wall_k256_us, dispatch_us, window_mean_iters):
        slope_us = median over 5 interleaved reps of
        (t_KHI - t_K)/(K_HI - K) — the steady-state per-step device cost of
        steps K..K_HI-1, with the per-call dispatch constant cancelled;
        wall_k256_us = legacy t_K/K; dispatch_us = t_K - K*slope (the
        infrastructure constant, reported so regressions are visible);
        window_mean_iters = per-step PCG iterations over the slope window.
        """
        fn_lo = make_chain(linsys, pcg_cfg, fused_dz=fused_dz, k=K)
        fn_hi = make_chain(linsys, pcg_cfg, fused_dz=fused_dz, k=K_HI)
        out_lo = fn_lo(xu, lam, xs, ee0, rho)
        jax.block_until_ready(out_lo)
        out_hi = fn_hi(xu, lam, xs, ee0, rho)
        jax.block_until_ready(out_hi)
        t_lo, t_hi = [], []
        for _ in range(5):  # interleave lo/hi so drift cancels in the slope
            t0 = time.perf_counter()
            out_lo = fn_lo(xu, lam, xs, ee0, rho)
            jax.block_until_ready(out_lo)
            t_lo.append((time.perf_counter() - t0) * 1e6)
            t0 = time.perf_counter()
            out_hi = fn_hi(xu, lam, xs, ee0, rho)
            jax.block_until_ready(out_hi)
            t_hi.append((time.perf_counter() - t0) * 1e6)
        slopes = [(b - a) / (K_HI - K) for a, b in zip(t_lo, t_hi)]
        slope = float(np.median(slopes))
        wall = float(np.median(t_lo)) / K
        dispatch = float(np.median(t_lo)) - K * slope
        it_win = (float(np.asarray(out_hi[5])) - float(np.asarray(out_lo[5]))) / (
            K_HI - K)
        return slope, wall, dispatch, it_win

    import dataclasses

    if repeats:
        # Interleaved A/B noise protocol (VERDICT r4 item 3): `repeats`
        # alternated chain timings per variant, median +- IQR each, one JSON
        # line per variant plus an adjudication line.  Used for default
        # flips (fused_dz) where the margin must exceed the measured noise.
        fns = {
            "fused_dz_off": make_chain(linsys, pcg_cfg, fused_dz=False),
            "fused_dz_on": make_chain(linsys, pcg_cfg, fused_dz=True),
        }
        samples = {k: [] for k in fns}
        for fn in fns.values():  # compile both before timing
            jax.block_until_ready(fn(xu, lam, xs, ee0, rho))
        for _ in range(repeats):
            for k, fn in fns.items():  # alternate variants within each rep
                t0 = time.perf_counter()
                jax.block_until_ready(fn(xu, lam, xs, ee0, rho))
                samples[k].append((time.perf_counter() - t0) * 1e6 / K)
        stats = {}
        for k, v in samples.items():
            q1, q2, q3 = np.percentile(v, [25, 50, 75])
            stats[k] = dict(median_us=round(float(q2), 1),
                            iqr_us=round(float(q3 - q1), 1),
                            n=repeats)
            print(json.dumps(dict(metric=f"ab_{k}_n64", unit="us",
                                  **stats[k])))
        d = stats["fused_dz_on"]["median_us"] - stats["fused_dz_off"]["median_us"]
        noise = max(stats["fused_dz_on"]["iqr_us"],
                    stats["fused_dz_off"]["iqr_us"])
        print(json.dumps(dict(metric="ab_fused_dz_verdict",
                              delta_us=round(d, 1), iqr_noise_us=noise,
                              significant=bool(abs(d) > noise),
                              winner=("on" if d < 0 else "off"))))
        return

    # headline = the REFERENCE's exit semantics (|eta| = |r . P^-1 r| < tol,
    # GBD-PCG / SURVEY.md C17, re-derived round 5) at the reference
    # tolerance, with the iteration cap TUNED FOR THIS CHIP exactly the way
    # the reference tuned its own caps for its GPU ("values found using
    # experiments", settings.cuh:123-144): PCGConfig.tuned_max_iter_tpu from
    # tools/tune_pcg_caps.py closed-loop sweeps — equal-or-better tracking
    # error than the reference cap on the 600-step production loop (0.0317
    # vs 0.0428 at N=64; RESULTS stage=tune_exitrate_64).  The
    # reference-cap point is reported alongside as `ref_cap_us` (exact
    # parity operating point), the absolute-||r|| criterion as `rnorm_us`
    # (always cap-bound at these tols in f32 — the fixed-cap worst case,
    # tools/diagnose_rnorm.py).
    try:
        ref_med, ref_wall, ref_disp, ref_iters = run(linsys, pcg_cfg)
    except Exception:
        linsys = "pcg"
        ref_med, ref_wall, ref_disp, ref_iters = run(linsys, pcg_cfg)
    rnorm_cfg = dataclasses.replace(pcg_cfg, exit_criterion="rnorm")
    rnorm_med, _, _, rnorm_iters = run(linsys, rnorm_cfg)
    # exact-direct-solve variant (parallel cyclic reduction, C5'/run_all
    # config 6): one refined PCR solve replaces the whole CG loop — reported
    # alongside since its accuracy is tolerance-free
    try:
        pcr_med, _, _, _ = run("pcr_pallas" if linsys == "pcg_pallas"
                               else "pcr", pcg_cfg)
    except Exception:  # noqa: BLE001
        pcr_med = None
    # split dz variant (4 kernel launches instead of 3; the pre-round-4
    # default, kept as the A/B counterpart of the fused epilogue)
    fdz_med = None
    if linsys == "pcg_pallas":
        try:
            fdz_med, _, _, _ = run(linsys, pcg_cfg, fused_dz=False)
        except Exception:  # noqa: BLE001
            pass
    # the headline: TPU-tuned cap (falls back to the reference-cap number
    # when the tuned run fails, e.g. on the XLA fallback path)
    tuned_cfg = dataclasses.replace(
        pcg_cfg, max_iter=PCGConfig.tuned_max_iter_tpu(N))
    try:
        med, wall, disp, iters = run(linsys, tuned_cfg)
        cap, cap_table = tuned_cfg.max_iter, "tpu"
    except Exception:  # noqa: BLE001
        med, wall, disp, iters = ref_med, ref_wall, ref_disp, ref_iters
        cap, cap_table = pcg_cfg.max_iter, "ref"

    print(
        json.dumps(
            dict(
                metric=METRIC,
                value=round(med, 1),
                unit="us",
                vs_baseline=round(2000.0 / med, 3),
                exit_criterion="eta",
                pcg_cap=cap,
                cap_table=cap_table,
                mean_pcg_iters=round(iters, 1),
                wall_k256_us=round(wall, 1),
                per_call_dispatch_ms=round(disp / 1000.0, 1),
                ref_cap_us=round(ref_med, 1),
                ref_cap_mean_pcg_iters=round(ref_iters, 1),
                rnorm_us=round(rnorm_med, 1),
                rnorm_mean_pcg_iters=round(rnorm_iters, 1),
                pcr_us=None if pcr_med is None else round(pcr_med, 1),
                split_dz_us=None if fdz_med is None else round(fdz_med, 1),
                chain_len=[K, K_HI],
                linsys=linsys,
            )
        )
    )


def _subprocess_main(timeout_s):
    """Run the real bench as a killable child (`bench.py --main`) and
    forward its stdout — a mid-run wedge blocks in C and cannot be
    interrupted in-process."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--main"],
        capture_output=True, text=True, timeout=timeout_s)
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    if res.returncode != 0 or not lines:
        raise RuntimeError(f"bench child failed (rc={res.returncode}): "
                           f"{res.stderr[-300:]}")
    json.loads(lines[-1])  # must be the one-line JSON contract
    print(lines[-1])


def run_guarded(main_fn=None, probe_fn=None, main_timeout_s=None):
    """Probe the backend, then run the bench under a hang watchdog.

    Any backend failure (init error, probe timeout, mid-run wedge) degrades
    to emit_unavailable() + exit code 0 so BENCH_r* stays machine-readable.
    Default probe and main run as killable subprocesses; injected test fns
    run in-process under SIGALRM (sufficient for interruptible Python).
    """
    if main_timeout_s is None:
        main_timeout_s = int(os.environ.get("BENCH_TIMEOUT_S", "2700"))
    try:
        probe_backend(_probe_fn=probe_fn)
    except Exception as e:  # noqa: BLE001
        emit_unavailable(e)
        return 0
    if main_fn is None:
        try:
            _subprocess_main(main_timeout_s)
        except Exception as e:  # noqa: BLE001
            emit_unavailable(e)
        return 0
    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(main_timeout_s)
    try:
        main_fn()
    except Exception as e:  # noqa: BLE001
        emit_unavailable(e)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    return 0


if __name__ == "__main__":
    import sys

    repeats = 0
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    if "--main" in sys.argv or repeats:
        # --repeats K runs the interleaved fused_dz A/B directly (multi-line
        # output, queue/analysis use); the driver contract path is the
        # guarded single-line run below.
        main(repeats=repeats)
    else:
        raise SystemExit(run_guarded())
