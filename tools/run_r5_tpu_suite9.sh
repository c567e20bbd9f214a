#!/bin/bash
# Round-5 suite, ninth wave: rebuild the wave-8 backlog after the /tmp wipe
# (all codes caches + .done markers lost). Sized for a ~1h session:
# headline bench first, then the v3 sorted-kernel A/B (the wave-7 open
# question: does dropping PrefetchScalarGridSpec recover the 3.5-3.9x
# regression?), each cell paired with a SAME-SESSION unsorted baseline so
# tunnel variance (+-4%) cannot fake the verdict. 40M deep-cand serving and
# selftrain_v2 chain opportunistically after.
set -u
OUT=${1:-/tmp/r5_tpu9}
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

# 0. Headline bench EARLY (driver artifact insurance)
run bench 1200 python bench.py

# 1. v3 sorted-kernel A/B at m=12/coarse=2048 (cheapest cell). Unsorted
#    baseline FIRST so the codes cache is built once and both engines are
#    timed in the same session.
run ab_m12_unsorted 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m12_unsorted.json"
run ab_m12_sorted_v3 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12 --coarses 2048 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m12_sorted_v3.json"

# 2. Same A/B at m=16/coarse=4096 (the cell where sorting saves the most
#    MXU passes: 48->20).
run ab_m16_unsorted 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m16_unsorted.json"
run ab_m16_sorted_v3 3600 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 16 --coarses 4096 --cands 100 --engine pallas_sorted \
    --cache-dir "$OUT/codes4m" --out "$OUT/ab_m16_sorted_v3.json"

# 3. 40M deep-cand serving (closes the "cand=100 is candidate-bound; a
#    deeper-cand row is queued" claim). Re-trains + re-encodes (cache gone;
#    ~683 s encode) then scans at cand=400.
run pq40m_deep 10800 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --cand 400 --codes-cache /tmp/pq40m_aniso_codes.npz

# 4. 40M sorted serving (reuses the cache just built; only meaningful if
#    the v3 A/B wins, but cheap once the cache exists).
run pq40m_sorted 7200 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --cand 400 --codes-cache /tmp/pq40m_aniso_codes.npz \
    --sorted-coarse

# 5. selftrain v2 (reduced from 12k to 6k steps to fit): 60M params, then
#    re-eval the leaderboard top-3 variants.
run selftrain_v2 7200 python -u tools/selftrain_lm.py \
    --out checkpoints/selftrained_v2 \
    --steps 6000 --hidden 640 --layers 10 --heads 10 --kv-heads 5 \
    --inter 1920 --qa-every 3
run eval_selftrained_v2 5400 python -u tools/eval_selftrained.py \
    --ckpt checkpoints/selftrained_v2 --variants int8,gptq,nf4 \
    --out results/selftrained_v2

run bench_final 1200 python bench.py

echo "== suite9 complete; logs in $OUT"
