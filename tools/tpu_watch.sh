#!/bin/bash
# TPU tunnel watcher: probe every PERIOD seconds; the moment a trivial jit
# compiles+runs on the axon TPU, fire the queued re-validation campaign(s)
# and exit.  Survives wedged-tunnel hangs via subprocess timeouts (the axon
# plugin blocks at `import jax` when the tunnel is down — see
# .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue_r5}
PERIOD=${PERIOD:-120}
mkdir -p "$OUT"
echo "watch start $(date +%T)" >> "$OUT/watch.log"
while true; do
  if timeout 90 env PYTHONPATH=/root/.axon_site:$PWD python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
jax.jit(lambda a: a.sum())(jnp.ones((8, 128))).block_until_ready()
" >/dev/null 2>&1; then
    echo "tunnel UP $(date +%T) — firing queue" >> "$OUT/watch.log"
    for q in tools/tpu_queue2.sh tools/tpu_queue3.sh; do
      [ -f "$q" ] && bash "$q" "$OUT" >> "$OUT/watch.log" 2>&1
    done
    echo "queues done $(date +%T)" >> "$OUT/watch.log"
    exit 0
  fi
  echo "tunnel down $(date +%T)" >> "$OUT/watch.log"
  sleep "$PERIOD"
done
