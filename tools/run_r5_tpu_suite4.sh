#!/bin/bash
# Round-5 suite, fourth wave: the pq_kernel_ab step that wave 3 skipped
# (the step was inserted into run_r5_tpu_suite3.sh while bash was already
# executing the file — bash reads scripts incrementally, so the in-flight
# interpreter never saw it), plus a final bench sanity pass.
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

# Kernel A/B: split-bf16 coarse dots in the residual-ADC kernel. Codes for
# 4M/m=12/c=2048 are cached from wave 1 (which measured 110.44 ms with the
# f32-coarse kernel at cand=100) — this re-times just the scan.
run pq_kernel_ab 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --out "$OUT/pq_kernel_ab.json"

# Sorted-coarse residual-ADC kernel A/B (new in r5 wave 4): same cells the
# unsorted kernel measured in wave 3 — codes caches are shared, so only the
# sort + scan run. Unsorted baselines: m=16/c=4096/cand=100 149.76 ms,
# m=12/c=2048/cand=100 per pq_kernel_ab above.
run pq_sorted_ab_m16 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --out "$OUT/pq_sorted_ab.json"
run pq_sorted_ab_m12 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --out "$OUT/pq_sorted_ab.json"

# 40M sorted-coarse serving A/B (codes cache shared with the wave-3
# pq40m_aniso_v2 run; only sort + scan run fresh)
run pq40m_sorted 7200 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --codes-cache /tmp/pq40m_aniso_codes.npz --sorted-coarse

# Final headline sanity (the driver reruns this at round end; catching a
# regression here is cheaper than in BENCH_r05.json)
run bench_final 1200 python bench.py

echo "== suite4 complete; logs in $OUT"
