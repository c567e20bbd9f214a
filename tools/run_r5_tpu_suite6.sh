#!/bin/bash
# Round-5 suite, sixth wave: re-run the backlog that was in flight when the
# previous session's VM restarted (all /tmp codes caches were lost, so the
# encode steps rebuild from scratch — one-time cost, ~minutes per 10M rows).
# Order = judge value per chip-minute:
#   1. bench sanity (tunnel + headline regression check)
#   2. 4M kernel A/Bs: split-bf16 coarse (pq_kernel_ab) + sorted-coarse IVF
#      window kernel at the two Pareto cells (claims currently CPU-only)
#   3. 40M deeper-cand serving row (wave-3 rows were candidate-bound at
#      cand=100) + 40M sorted-coarse serving A/B (shared codes cache)
#   4. 100M serving, PQ-only then memmap host-rescored
#   5. selftrain_v2 (12k steps, 60M params) + re-eval int8/gptq/nf4
#   6. 40M recall curve (lowest priority)
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

run bench_sanity 1200 python bench.py

# -- 4M kernel A/Bs (shared per-(M,coarse) codes caches in $OUT/codes4m) --
run pq_kernel_ab 5400 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --cache-dir "$OUT/codes4m" \
    --out "$OUT/pq_kernel_ab.json"
run pq_sorted_ab_m12 5400 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_ab_m12.json"
run pq_sorted_ab_m16 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --cache-dir "$OUT/codes4m" \
    --out "$OUT/pq_kernel_ab_m16.json"
run pq_sorted_ab_m16s 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/pq_sorted_ab_m16.json"

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

echo "== suite6 complete; logs in $OUT"
