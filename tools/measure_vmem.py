#!/usr/bin/env python3
"""Measure the fused pipeline's compiled memory footprint per horizon.

Prints one JSON line per N with the XLA-reported compiled memory breakdown
(`compiled.memory_analysis()`): temp (scratch/intermediate allocations —
where XLA pins pallas-to-pallas buffers), arguments, outputs, and the model
estimate `fused_pipeline_vmem_bytes` next to it.  Purpose: a SECOND (and
third) calibration point for utils/occupancy.py beyond the single N=512
19.4 MiB anchor (VERDICT r4 weak #7) — if the measured footprint scales
with the model's padded per-lane geometry, the `_MOSAIC_TEMP_FACTOR`
transfer claim holds; if not, the model needs a shape-dependent term.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/measure_vmem.py \
         [--knots 128 256 512]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import CostConfig, PCGConfig, SQPConfig
from mpcgpu_tpu.models import iiwa14
from mpcgpu_tpu.solver.sqp import sqp_solve
from mpcgpu_tpu.utils.occupancy import fused_pipeline_vmem_bytes
from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj


def probe_scoped_peak(build_and_compile, lo_mib=2.0, hi_mib=100.0,
                      tol_mib=2.0):
    """Binary-search the smallest Mosaic ``vmem_limit_bytes`` under which the
    program still compiles — i.e. the TRUE peak scoped-VMEM requirement of
    the worst kernel in the program (Mosaic rejects the compile with
    "Scoped allocation ... exceeded scoped vmem limit" below it).  This is
    the same failure mode that produced the original 19.4 MiB N=512
    calibration figure (utils/mosaic.py docstring), i.e. the matching
    instrument for utils/occupancy.py's model."""
    import os

    def ok(limit_mib):
        os.environ["MPCGPU_TPU_KERNEL_VMEM_LIMIT_BYTES"] = str(
            int(limit_mib * 2**20))
        # module-level inner jits cache their traces WITH the pallas
        # compiler params baked in — without a cache clear every attempt
        # silently reuses the first trace's limit (measured: the probe
        # returned the floor for every N)
        jax.clear_caches()
        try:
            build_and_compile()
            return True
        except Exception:  # noqa: BLE001 - Mosaic raises various wrappers
            return False
        finally:
            os.environ.pop("MPCGPU_TPU_KERNEL_VMEM_LIMIT_BYTES", None)
            jax.clear_caches()

    if not ok(hi_mib):
        return None  # fails even at the ceiling: not a scoped-vmem issue
    lo, hi = lo_mib, hi_mib
    if ok(lo):
        return lo  # fits even the floor
    while hi - lo > tol_mib:
        mid = 0.5 * (lo + hi)
        if ok(mid):
            hi = mid
        else:
            lo = mid
    return hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--probe-limit", action="store_true",
                    help="binary-search the Mosaic scoped-VMEM peak of the "
                    "fused pipeline per horizon (several recompiles per N)")
    args = ap.parse_args()

    dtype = jnp.float32
    model = iiwa14(dtype=dtype)
    xu_full = jnp.asarray(load_xu_traj("0_0"), dtype)
    ee_full = jnp.asarray(load_eepos_traj("0_0"), dtype)
    linsys = "pcg_pallas" if jax.default_backend() == "tpu" else "pcg"

    for N in args.knots:
        cost = CostConfig.for_knots(N)
        pcg_cfg = PCGConfig(max_iter=PCGConfig.tuned_max_iter(N),
                            exit_tol=1e-5)
        sqp_cfg = SQPConfig(max_iter=1)
        xu = xu_full[:N]
        ee = ee_full[:N]
        lam = jnp.zeros((N, 14), dtype)
        rho = jnp.asarray(1e-3, dtype)

        def step(xu, lam, xs, ee, rho):
            res = sqp_solve(model, cost, sqp_cfg, pcg_cfg, xu, lam, xs, ee,
                            rho, 1.0 / 64.0, linsys=linsys)
            return res.xu, res.lam, res.rho

        lowered = jax.jit(step).lower(xu, lam, xu[0, :14], ee, rho)
        compiled = lowered.compile()
        row = dict(metric="fused_pipeline_compiled_memory", knots=N,
                   linsys=linsys, backend=jax.default_backend(),
                   model_estimate_mib=round(
                       fused_pipeline_vmem_bytes(7, N, dtype) / 2**20, 2))
        try:
            ma = compiled.memory_analysis()
            for f in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, f, None)
                if v is not None:
                    row[f.replace("_size_in_bytes", "_mib")] = round(
                        int(v) / 2**20, 3)
        except Exception as e:  # noqa: BLE001 - relay backends vary
            row["memory_analysis_error"] = str(e)[:200]
        # sanity: the compiled program must actually run
        out = jax.block_until_ready(jax.jit(step)(xu, lam, xu[0, :14], ee,
                                                  rho))
        row["ran_ok"] = bool(np.isfinite(np.asarray(out[0])).all())
        if args.probe_limit:
            peak = probe_scoped_peak(
                lambda: jax.jit(step).lower(xu, lam, xu[0, :14], ee,
                                            rho).compile())
            row["scoped_vmem_peak_mib"] = (
                None if peak is None else round(peak, 1))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
