#!/bin/bash
# Round-5 wave 9b: the v3 sorted-kernel A/B with the Mosaic block-shape fix
# (wave 9's sorted steps raced the fix and ran the old [ntiles,128] input,
# which Mosaic rejects: last-two block dims must be (8k,128k)). Codes caches
# for both cells exist from wave 9, so these are scan-only (~minutes each).
# Then a reduced selftrain_v2 if the session survives that long.
set -u
OUT=${1:-/tmp/r5_tpu9}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
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

run ab_m12_sorted_v3b 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m12_sorted_v3b.json"
run ab_m16_sorted_v3b 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m16_sorted_v3b.json"

run bench_final_b 1200 python bench.py

# Opportunistic: reduced selftrain v2 (60M params, 4k steps) + re-eval.
# (Names suffixed _b: the plain names carry synthetic .done markers placed
# to make wave 9 exit early after its 40M steps.)
run selftrain_v2_b 7200 python -u tools/selftrain_lm.py \
    --out checkpoints/selftrained_v2 \
    --steps 4000 --hidden 640 --layers 10 --heads 10 --kv-heads 5 \
    --inter 1920 --qa-every 3
run eval_selftrained_v2_b 5400 python -u tools/eval_selftrained.py \
    --ckpt checkpoints/selftrained_v2 --variants int8,gptq,nf4 \
    --out results/selftrained_v2

echo "== suite9b complete; logs in $OUT"
