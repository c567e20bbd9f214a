#!/bin/bash
# Poll the axon tunnel; the moment a probe succeeds, run the round-4
# on-chip suite once. Meant to be left running detached during a tunnel
# outage:
#   nohup bash tools/tpu_autorun.sh > /tmp/tpu_autorun.log 2>&1 &
# The suite itself is resumable (per-step .done markers), so this can be
# re-launched safely after interruptions.
set -u
OUT=${1:-/tmp/r4_tpu}
cd "$(dirname "$0")/.."

for i in $(seq 1 1000); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "== tunnel up at $(date); starting suite (logs in $OUT)"
    exec bash tools/run_r4_tpu_suite.sh "$OUT"
  fi
  echo "probe $i: tunnel down at $(date)"
  sleep 300
done
echo "gave up after 1000 probes"
exit 1
