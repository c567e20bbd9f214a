#!/bin/bash
# Round-4 on-chip measurement suite — run when the axon tunnel is up.
# Supersedes run_r3_tpu_suite.sh (same steps, plus the PQ recall curve of
# VERDICT r3 #2). Each step is independently resumable; results append to
# /tmp/r4_tpu/. Order matters: smoke gates everything; the scan + probe
# steps are the cheapest high-value items, the 40M/100M serving runs are
# the longest.
set -u
OUT=${1:-/tmp/r4_tpu}
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

# 1. Mosaic lowering smoke for the round-3 kernel forms (fast, gates the rest)
run smoke 1800 python tools/tpu_kernel_smoke.py

# 1b. Headline bench EARLY: if the tunnel dies again mid-suite, the driver
#     artifact still gets a measured number instead of an outage marker.
run bench 1200 python bench.py

# 2. Scan kernel at 10M: round-3 form (repair+group auto) vs pinned round-2 form
run scan10m_r3   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64
run scan10m_r2   1800 python tools/bench_scale.py --rows 10000000 --batch 64 --k 64 --kb 8
run scan10m_b256 1800 python tools/bench_scale.py --rows 10000000 --batch 256 --k 64

# 3. Manual-DMA streaming rate probe (decides the fused-layer story)
run pldb 1800 python tools/bench_chain_gemv.py --d 4096 --layers 16 --r 8 --variants int8,pldb

# 4. Fused MLP vs XLA int8 path at Mistral dims
run fused_mlp 2400 python tools/bench_fused_mlp.py --h 4096 --inter 14336 --layers 8

# 5. PQ recall/latency curve at 4M (VERDICT r3 #2); configs guided by the
#    CPU 1M sweep in results/pq_recall/curve_cpu_1m.json
run pq_curve_4m 10800 python -u tools/pq_recall_curve.py --rows 4000000 \
    --out "$OUT/pq_curve_4m.json"

# 5b. Anisotropic (ScaNN-loss) codebooks on the strongest configs: same
#     bytes/vec, recall lift from score-aware codeword placement.
run pq_curve_4m_aniso 7200 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12,16 --coarses 2048,4096 --cands 200,400 --etas auto \
    --out "$OUT/pq_curve_4m_aniso.json"

# 6. PQ-only serving at 40M (codes cached for resume), then 100M
run pq40m 9000 python -u tools/bench_pq_serving.py --rows 40000000 --codes-cache /tmp/pq40m_codes.npz

# 6b. Same 40M serving point with the anisotropic codebooks (round 4):
#     recall lift at identical 14 B/vec and scan cost.
run pq40m_aniso 9000 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --codes-cache /tmp/pq40m_aniso_codes.npz
run pq100m 9000 python -u tools/bench_pq_serving.py --rows 100000000 --no-host-mirror --codes-cache /tmp/pq100m_codes.npz

# 6c. 100M WITH host rescore via the round-4 disk-backed memmap mirror
#     (38 GB pages from disk; RAM never holds it).
run pq100m_host 10800 python -u tools/bench_pq_serving.py --rows 100000000 \
    --host-mirror --mirror-mmap /tmp/pq100m_mirror \
    --codes-cache /tmp/pq100m_codes.npz

# 7. Best-config recall check at 40M: reuse the 40M codes cache if the
#    winning (M, coarse) matches; otherwise this trains its own.
run pq_curve_40m 14400 python -u tools/pq_recall_curve.py --rows 40000000 \
    --ms 16 --coarses 4096 --cands 200,400 --out "$OUT/pq_curve_40m.json"

echo "== suite complete; logs in $OUT"
grep -h . "$OUT"/*.log 2>/dev/null | grep -E '^\{' || true
