#!/bin/bash
# Round-5 TPU campaign, part 2: work that needs the round-5 code
# (eta-primary bench, TPU-tuned caps, fused_dz A/B noise protocol,
# multi-SQP frontier, fixed smoke twin-isolation).  Same stage protocol /
# log-dir layout as tools/tpu_queue.sh so tools/ingest_tpu_queue.py ingests
# the run.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue_r5b}
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

# 1. fused_dz default adjudication: interleaved median-of-7 A/B with spread
stage ab_fused_dz python bench.py --repeats 7

# 2. canonical chain at the TPU-retuned caps (tracking-err guard for the
#    tuned operating point; ref-cap rows already measured this round)
stage parity_tpu_caps python benchmarks/parity_table.py --caps tpu \
  --knots 32 64

# 3. extend the TPU cap table: N=128 sweep
stage tune_eta_128 python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 128 --caps 40 80 120 167 --tols 1e-5 1e-6

# 4. multi-SQP-iteration frontier at N=64 (VERDICT r4 item 9): tracking
#    error vs SQP iters/step at 500 Hz, TPU-tuned cap
stage sqp_frontier_1 python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 64 --caps 80 --tols 1e-5 --sqp-iters 1
stage sqp_frontier_2 python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 64 --caps 80 --tols 1e-5 --sqp-iters 2
stage sqp_frontier_4 python tools/tune_pcg_caps.py --exit-criterion eta \
  --knots 64 --caps 80 --tols 1e-5 --sqp-iters 4

# 5. full smoke with the round-5 twin-isolated dz checks (expect 0 FAIL)
stage smoke_full3 python tools/tpu_smoke.py

echo "queue3 done; statuses:"; cat "$OUT/queue_status"
