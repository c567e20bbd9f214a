#!/bin/bash
# Round-5 suite, eighth wave: v3 sorted-kernel A/B (no PrefetchScalarGridSpec
# — wbase rides as a normal pipelined [ntiles,128] input; v1/v2 both measured
# ~3.5-3.9x slower and the common factor was the scalar-prefetch grid spec),
# then the rest of the wave-6 backlog that was in flight when the session
# died: deeper-cand 40M serving, 40M sorted serving, 100M serving (PQ-only +
# memmap host-rescored), selftrain_v2, 40M curve.
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

# -- v3 sorted-kernel A/B at the two measured cells (codes caches exist) --
run pq_sorted_v3_m12 5400 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_v3_m12.json"
run pq_sorted_v3_m16 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_v3_m16.json"

# -- 40M serving: deeper cand (wave-3 rows were candidate-bound) + sorted --
run pq40m_deep 10800 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --cand 400 --codes-cache /tmp/pq40m_aniso_codes.npz
run pq40m_sorted 7200 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --cand 400 --codes-cache /tmp/pq40m_aniso_codes.npz \
    --sorted-coarse

# -- 100M serving --
run pq100m_v2 14400 python -u tools/bench_pq_serving.py --rows 100000000 \
    --no-host-mirror --codes-cache /tmp/pq100m_codes.npz
run pq100m_host_v2 10800 python -u tools/bench_pq_serving.py --rows 100000000 \
    --host-mirror --mirror-mmap /tmp/pq100m_mirror \
    --codes-cache /tmp/pq100m_codes.npz

# -- selftrain v2: 60M params, 12k steps, then re-eval the leaderboard top3 --
run selftrain_v2 7200 python -u tools/selftrain_lm.py \
    --out checkpoints/selftrained_v2 \
    --steps 12000 --hidden 640 --layers 10 --heads 10 --kv-heads 5 \
    --inter 1920 --qa-every 3
run eval_selftrained_v2 5400 python -u tools/eval_selftrained.py \
    --ckpt checkpoints/selftrained_v2 --variants int8,gptq,nf4 \
    --out results/selftrained_v2

# -- 40M recall curve (lowest priority) --
run pq_curve_40m_v2 14400 python -u tools/pq_recall_curve.py --rows 40000000 \
    --ms 16 --coarses 4096 --cands 200,400 --out "$OUT/pq_curve_40m.json"

run bench_final 1200 python bench.py

echo "== suite8 complete; logs in $OUT"
