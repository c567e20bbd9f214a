#!/bin/bash
# Round-5 on-chip measurement suite. Supersedes run_r4_tpu_suite.sh: same
# backlog (the r4 runs all failed on the 16 MB scoped-VMEM AOT default —
# fixed in crs_tpu/ops/* via CompilerParams(vmem_limit_bytes=100MB)), plus
# the self-trained generator (VERDICT r4 #2) early in the queue.
# Each step is independently resumable; results append to /tmp/r5_tpu/.
set -u
OUT=${1:-/tmp/r5_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.json" ] || [ -e "$OUT/$name.done" ]; then
    echo "== $name: already done, skipping"; return
  fi
  echo "== $name"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  if [ $rc -eq 0 ]; then touch "$OUT/$name.done"; fi
  return 0
}

# 1. Mosaic lowering smoke (now exercises the raised VMEM budget + nf4)
run smoke 1800 python tools/tpu_kernel_smoke.py

# 1b. Headline bench EARLY (outage insurance)
run bench 1200 python bench.py

# 2. Self-train the generator (VERDICT r4 #2): corpus byte-LM + QA-instruct
run selftrain 5400 python -u tools/selftrain_lm.py \
    --out checkpoints/selftrained_small --steps 3000

# 3. Scan kernel at 10M — the r4 casualties (kb=8 pinned; batch 256)
run scan10m_r2   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64 --kb 8
run scan10m_b256 2400 python tools/bench_scale.py --rows 10000000 --batch 256 --k 64
run scan10m_r3   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64

# 4. Fused MLP retry (r4: remote-compile 500; retest under the new budget)
run fused_mlp 2400 python tools/bench_fused_mlp.py --h 4096 --inter 14336 --layers 8

# 4b. Manual-DMA streaming probe — r4 printed NEGATIVE ms/chain: the n2-n1=4
#     in-jit rep delta (~1 ms) is below tunnel dispatch jitter. 100-rep delta
#     (~30-80 ms) resolves it.
run pldb 2400 python tools/bench_chain_gemv.py --d 4096 --layers 16 --r 8 \
    --variants int8,pldb --n1 10 --n2 110 --reps 7

# 5. PQ recall/latency curve at 4M (VERDICT r3 #2; r4 compile casualties)
run pq_curve_4m 10800 python -u tools/pq_recall_curve.py --rows 4000000 \
    --out "$OUT/pq_curve_4m.json"
run pq_curve_4m_aniso 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12,16 --coarses 2048,4096 --cands 200,400 --etas auto \
    --out "$OUT/pq_curve_4m_aniso.json"

# 6. PQ-only serving at 40M (codes cached from r4), then 100M
run pq40m 9000 python -u tools/bench_pq_serving.py --rows 40000000 --codes-cache /tmp/pq40m_codes.npz
run pq40m_aniso 9000 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --codes-cache /tmp/pq40m_aniso_codes.npz
run pq100m 9000 python -u tools/bench_pq_serving.py --rows 100000000 --no-host-mirror --codes-cache /tmp/pq100m_codes.npz
run pq100m_host 10800 python -u tools/bench_pq_serving.py --rows 100000000 \
    --host-mirror --mirror-mmap /tmp/pq100m_mirror \
    --codes-cache /tmp/pq100m_codes.npz

# 7. Best-config recall check at 40M
run pq_curve_40m 14400 python -u tools/pq_recall_curve.py --rows 40000000 \
    --ms 16 --coarses 4096 --cands 200,400 --out "$OUT/pq_curve_40m.json"

echo "== suite complete; logs in $OUT"
grep -h . "$OUT"/*.log 2>/dev/null | grep -E '^\{' || true
