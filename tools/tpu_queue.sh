#!/bin/bash
# TPU re-validation campaign (VERDICT r3 item 1): run EVERYTHING that needs
# the chip, in priority order, as soon as the tunnel is back.  Each stage
# logs to $OUT/<stage>.log and appends one status line to $OUT/queue_status;
# stages are independent (a failure does not stop the queue).
#
#   bash tools/tpu_queue.sh [outdir]
#
# Expected wall: ~60-90 min cold cache (Mosaic compiles of the big fused
# kernels dominate: ~6 min at N=256, more at N=512), much less warm.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
export PYTHONPATH=/root/.axon_site:$PWD

stage() {
  local name=$1; shift
  echo "=== $name: $* ===" | tee -a "$OUT/queue_status"
  local t0=$SECONDS
  if timeout "${STAGE_TIMEOUT:-3600}" "$@" >"$OUT/$name.log" 2>&1; then
    echo "OK   $name ($((SECONDS-t0))s)" | tee -a "$OUT/queue_status"
  else
    echo "FAIL $name rc=$? ($((SECONDS-t0))s) — see $OUT/$name.log" \
      | tee -a "$OUT/queue_status"
  fi
}

# 0. probe: one trivial jit (fast fail if the tunnel is still wedged)
stage probe python -c "import jax, jax.numpy as jnp; \
print(jax.block_until_ready(jax.jit(lambda a: a.sum())(jnp.ones((8,128)))))"
grep -q "^OK   probe" "$OUT/queue_status" || { echo "tunnel still down"; exit 1; }

# 1. compiled-kernel smoke pass: every Pallas kernel vs its XLA twin at
#    every tuned horizon, incl. the slab kernels and the slab-PCG step
stage smoke_quick python tools/tpu_smoke.py --knots 32 64
stage smoke_full  python tools/tpu_smoke.py

# 2. headline bench (rnorm primary) — the BENCH_r04 number
stage bench python bench.py

# 3. canonical horizon table (rnorm + eta rows, all N) -> PARITY.md
stage parity_table python benchmarks/parity_table.py

# 4. slab-vs-full kernel cost at equal lane count (round-2/3 acceptance)
stage slab_cost_64  python benchmarks/slab_cost.py --length 64
stage slab_cost_128 python benchmarks/slab_cost.py --length 128

# 5. the unmeasured BASELINE configs[3] point: N=64 batched
#    (run_all.py numbering: config 4 = the batched-MPC config)
stage run_all_batched python benchmarks/run_all.py --configs 4 --batch-knots 64

# 6. slab-PCG per-iteration cost (VERDICT r3 item 2 acceptance)
stage pcg_slab_cost python benchmarks/pcg_slab_cost.py

# 6b. per-stage profile (PARITY per-stage table)
stage profile_stages python benchmarks/profile_stages.py -K 200

# 7. rnorm cap/tolerance retuning (VERDICT r3 item 4) + eta<->rnorm mapping
stage tune_rnorm python tools/tune_pcg_caps.py --exit-criterion rnorm \
  --knots 32 64 --tols 1e-5 2.5e-6 1e-6
stage tune_eta   python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 32 64 --tols 1e-5 2.5e-6 1e-6

# 7b. negative studies at PRODUCTION shapes on the chip (VERDICT r3 weak 7:
#     the round-3 conclusions came from N=16/N=32 CPU runs)
stage warmstart_64 python benchmarks/warmstart_study.py --knots 64 --steps 64
stage precond_prod python benchmarks/precond_study.py --knots 64 512 \
  --tols 1e-5 1e-6
stage forcing_off python examples/track_iiwa_pcg.py --knots 64 --ondevice \
  --tols 1e-5 --exit-criterion rnorm --forcing fixed
stage forcing_ew  python examples/track_iiwa_pcg.py --knots 64 --ondevice \
  --tols 1e-5 --exit-criterion rnorm --forcing ew

# 8. exact-direct-solve closed loop: does PCR track as well as PCG at lower
#    latency? (PCR-SQP measured 228 us cold vs PCG 327 us warm, round 2)
stage pcr_closed_loop python examples/track_iiwa_pcg.py --knots 64 \
  --ondevice --linsys pcr_pallas --tols 1e-5
stage pcg_closed_loop python examples/track_iiwa_pcg.py --knots 64 \
  --ondevice --linsys pcg_pallas --tols 1e-5

echo "queue done; statuses:"; cat "$OUT/queue_status"
