#!/bin/bash
# Round-5 TPU campaign, part 3: instruments added mid-round — VMEM
# calibration points, closed-loop cap exit rates, multi-seed chain error
# bars.  Same stage protocol as tools/tpu_queue.sh (ingestable).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue_r5c}
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

# 1. compiled memory breakdown at three horizons (occupancy model's second
#    and third calibration points, VERDICT r4 weak #7)
stage measure_vmem python tools/measure_vmem.py --knots 128 256 512

# 2. closed-loop live-iteration/exit-rate columns at the tuned vs reference
#    cap (the production instrument's answer to "does eta exit below cap")
stage tune_exitrate_64 python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 64 --caps 80 167 --tols 1e-5

# 3. multi-seed canonical chains: error bars for the tracking-err column
#    (VERDICT r4 weak #6), both cap tables
stage parity_seeds_ref python benchmarks/parity_table.py --knots 32 64 \
  --seeds 3
stage parity_seeds_tpu python benchmarks/parity_table.py --knots 32 64 \
  --seeds 3 --caps tpu

echo "queue4 done; statuses:"; cat "$OUT/queue_status"
