#!/bin/bash
# Round-3 on-chip measurement suite — run when the axon tunnel is up.
# Each step is independently resumable; results append to /tmp/r3_tpu/.
set -u
OUT=${1:-/tmp/r3_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.json" ] || [ -s "$OUT/$name.done" ]; then
    echo "== $name: already done, skipping"; return
  fi
  echo "== $name"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  if [ $rc -eq 0 ]; then touch "$OUT/$name.done"; fi
  return 0
}

# 1. Mosaic lowering smoke for the new kernel forms (fast, gates the rest)
run smoke 1800 python tools/tpu_kernel_smoke.py

# 2. Scan kernel at 10M: round-3 form (repair+group auto) vs pinned round-2 form
run scan10m_r3   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64
run scan10m_r2   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64 --kb 8
run scan10m_b256 1800 python tools/bench_scale.py --rows 10000000 --batch 256 --k 64

# 3. Manual-DMA streaming rate probe (decides the fused-layer story)
run pldb 1800 python tools/bench_chain_gemv.py --d 4096 --layers 16 --r 8 --variants int8,pldb

# 4. Fused MLP vs XLA int8 path at Mistral dims
run fused_mlp 2400 python tools/bench_fused_mlp.py --h 4096 --inter 14336 --layers 8

# 5. PQ-only serving at 40M (codes cached for resume), then 100M
run pq40m 9000 python -u tools/bench_pq_serving.py --rows 40000000 --codes-cache /tmp/pq40m_codes.npz
run pq100m 9000 python -u tools/bench_pq_serving.py --rows 100000000 --no-host-mirror --codes-cache /tmp/pq100m_codes.npz

# 6. Headline bench
run bench 1200 python bench.py

echo "== suite complete; logs in $OUT"
grep -h . "$OUT"/*.log 2>/dev/null | grep -E '^\{' || true
