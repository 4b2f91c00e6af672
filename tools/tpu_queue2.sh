#!/bin/bash
# Re-sequenced TPU re-validation queue (round 4, session 2): headline + table
# first, long smoke after — same stage protocol/log dir as tools/tpu_queue.sh
# so tools/ingest_tpu_queue.py ingests both runs together.
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

# 1. headline bench (rnorm primary) — the BENCH_r04 number
stage bench python bench.py

# 2. finish the quick smoke (N=32/64 mostly warm now; merit-check fix in)
stage smoke_quick2 python tools/tpu_smoke.py --knots 32 64

# 3. canonical horizon table (rnorm + eta rows, all N) -> PARITY.md
stage parity_table python benchmarks/parity_table.py

# 4. slab-vs-full kernel cost + slab-PCG per-iteration cost (acceptances)
stage slab_cost_64  python benchmarks/slab_cost.py --length 64
stage pcg_slab_cost python benchmarks/pcg_slab_cost.py

# 5. the unmeasured BASELINE configs[3] point: N=64 batched
stage run_all_batched python benchmarks/run_all.py --configs 4 --batch-knots 64

# 6. full smoke incl. N=128..512 + slab + batched pipeline
stage smoke_full2 python tools/tpu_smoke.py

# 7. per-stage profile
stage profile_stages python benchmarks/profile_stages.py -K 200

# 8. rnorm cap/tolerance retuning + eta mapping
stage tune_rnorm python tools/tune_pcg_caps.py --exit-criterion rnorm \
  --knots 32 64 --tols 1e-5 2.5e-6 1e-6
stage tune_eta   python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 32 64 --tols 1e-5 2.5e-6 1e-6

# 9. production-shape negative studies
stage warmstart_64 python benchmarks/warmstart_study.py --knots 64 --steps 64
stage precond_prod python benchmarks/precond_study.py --knots 64 512 \
  --tols 1e-5 1e-6
stage forcing_off python examples/track_iiwa_pcg.py --knots 64 --ondevice \
  --tols 1e-5 --exit-criterion rnorm --forcing fixed
stage forcing_ew  python examples/track_iiwa_pcg.py --knots 64 --ondevice \
  --tols 1e-5 --exit-criterion rnorm --forcing ew

# 10. closed-loop linsys comparison
stage pcr_closed_loop python examples/track_iiwa_pcg.py --knots 64 \
  --ondevice --linsys pcr_pallas --tols 1e-5
stage pcg_closed_loop python examples/track_iiwa_pcg.py --knots 64 \
  --ondevice --linsys pcg_pallas --tols 1e-5

echo "queue2 done; statuses:"; cat "$OUT/queue_status"
