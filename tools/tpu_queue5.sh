#!/bin/bash
# Round-5 TPU campaign, part 4: the reference's tolerance-sweep validation
# protocol at the production horizon (its N=64 tol table,
# track_iiwa_pcg.cu:46-68) + a BASELINE config-matrix refresh.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue_r5d}
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

# the reference's N=64 exit-tolerance sweep values (track_iiwa_pcg.cu:53-56),
# full 5,204-step on-device closed loop, eta (= the reference semantics)
stage tolsweep_64_eta python examples/track_iiwa_pcg.py --knots 64 \
  --ondevice --tols 5e-5 2.5e-5 1e-5 --exit-criterion eta

# BASELINE config matrix refresh (direct LDL / jacobi / stair / long-N / PCR)
stage run_all_matrix python benchmarks/run_all.py --configs 1 2 3 5 6

echo "queue5 done; statuses:"; cat "$OUT/queue_status"
