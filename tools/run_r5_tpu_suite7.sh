#!/bin/bash
# Round-5 suite, seventh wave: A/B the v2 sorted-ADC kernel (resident coarse
# LUT + in-kernel dynamic window slice, commit 042b3b9) against the unsorted
# kernel at the two 4M cells where v1 was measured 3.9x slower. Reuses the
# wave-6 codes caches; run AFTER run_r5_tpu_suite6.sh finishes (the tunnel
# serializes clients).
set -u
OUT=${1:-/tmp/r5_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then
    echo "== $name: already done, skipping"; return
  fi
  echo "== $name"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  if [ $rc -eq 0 ]; then touch "$OUT/$name.done"; fi
  return 0
}

run pq_sorted_v2_m12 5400 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_v2_m12.json"
run pq_sorted_v2_m16 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_v2_m16.json"

echo "== suite7 complete; logs in $OUT"
