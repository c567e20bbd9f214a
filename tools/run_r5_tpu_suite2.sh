#!/bin/bash
# Round-5 follow-on measurements — run AFTER run_r5_tpu_suite.sh (that
# script was already executing when these steps were written; bash reads
# scripts incrementally, so appending to a running script is unsafe).
set -u
OUT=${1:-/tmp/r5_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
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

# scan10m batch=256 retry: the dense [B,N] lax.cond fallback OOMed HBM in
# the first attempt (13.2 GB program); the blockwise fallback (commit
# 2137cf3) bounds it to O(B·block) — re-measure.
run scan10m_b256_v2 2400 python tools/bench_scale.py --rows 10000000 --batch 256 --k 64

# Prefill MFU at production dims (VERDICT r4 #6): the honest compute-bound
# comparison vs the reference's 2.38% (T4 FP16)
run prefill_mfu_1b_bf16  2400 python tools/bench_prefill_mfu.py --config 1b --type bf16
run prefill_mfu_1b_int8  2400 python tools/bench_prefill_mfu.py --config 1b --type int8
run prefill_mfu_7b_bf16  3600 python tools/bench_prefill_mfu.py --config mistral-7b --type bf16 --batch 4

# Quality columns on the self-trained generator (VERDICT r4 #2): all six
# quantization variants through the full evaluation suite
run eval_selftrained 14400 python -u tools/eval_selftrained.py

echo "== suite2 complete; logs in $OUT"
