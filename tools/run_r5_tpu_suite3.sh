#!/bin/bash
# Round-5 suite, third wave: every step the post-suite2 fixes unblock.
#   - pq_encode blockwise (commit caac562): the aniso encodes + 100M builds
#     HBM-OOMed (17.17G / 23.85G of 15.75G) on the all-rows assignment
#     tables; now bounded at 64k rows/block.
#   - VMEM limit 100 -> 112 MB: residual-ADC kernel at m=16/group=8 needs a
#     measured 104.07 MB.
#   - prefill MFU timed the np-returning forward() (0.5 GB logits fetch per
#     call over the tunnel); now times forward_device + block_until_ready.
# Each step is independently resumable; curve steps also resume per-combo.
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

# Corrected prefill MFU (cheap; rerun first — old numbers measured the tunnel)
run prefill_mfu_1b_bf16_v2  2400 python tools/bench_prefill_mfu.py --config 1b --type bf16
run prefill_mfu_1b_int8_v2  2400 python tools/bench_prefill_mfu.py --config 1b --type int8
run prefill_mfu_7b_bf16_v2  3600 python tools/bench_prefill_mfu.py --config mistral-7b --type bf16 --batch 4

# 4M curve: m=16 cells (VMEM fix) — resumes past the measured m=12 grid
run pq_curve_4m_v2 10800 python -u tools/pq_recall_curve.py --rows 4000000 \
    --out "$OUT/pq_curve_4m.json"
# 4M aniso curve (encode fix)
run pq_curve_4m_aniso_v2 10800 python -u tools/pq_recall_curve.py --rows 4000000 \
    --ms 12,16 --coarses 2048,4096 --cands 200,400 --etas auto \
    --out "$OUT/pq_curve_4m_aniso.json"

# 40M aniso serving (encode fix; codes cache may be partial — tool rebuilds)
run pq40m_aniso_v2 10800 python -u tools/bench_pq_serving.py --rows 40000000 \
    --aniso-eta auto --codes-cache /tmp/pq40m_aniso_codes.npz

# 100M serving (encode fix kills the 23.85G build OOM)
run pq100m_v2 10800 python -u tools/bench_pq_serving.py --rows 100000000 \
    --no-host-mirror --codes-cache /tmp/pq100m_codes.npz
run pq100m_host_v2 10800 python -u tools/bench_pq_serving.py --rows 100000000 \
    --host-mirror --mirror-mmap /tmp/pq100m_mirror \
    --codes-cache /tmp/pq100m_codes.npz

# Best-config recall check at 40M (VMEM fix)
run pq_curve_40m_v2 14400 python -u tools/pq_recall_curve.py --rows 40000000 \
    --ms 16 --coarses 4096 --cands 200,400 --out "$OUT/pq_curve_40m.json"

echo "== suite3 complete; logs in $OUT"
grep -h . "$OUT"/*_v2.log "$OUT"/pq_curve_4m.log 2>/dev/null | grep -E '^\{' || true
