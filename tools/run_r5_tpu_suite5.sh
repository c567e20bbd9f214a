#!/bin/bash
# Round-5 suite, fifth wave (opportunistic — runs only if chip time remains):
# a longer/larger self-train to push the RAG quality rows toward the
# reference's F1 0.183, then re-eval the three variants that led the wave-2
# leaderboard (int8/gptq/nf4). Wave-2 model: 25.6M params, 3000 steps,
# F1 0.10-0.15.
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

run selftrain_v2 5400 python -u tools/selftrain_lm.py \
    --out checkpoints/selftrained_v2 \
    --steps 12000 --hidden 640 --layers 10 --heads 10 --kv-heads 5 \
    --inter 1920 --qa-every 3

run eval_selftrained_v2 3600 python -u tools/eval_selftrained.py \
    --ckpt checkpoints/selftrained_v2 --variants int8,gptq,nf4 \
    --out results/selftrained_v2

echo "== suite5 complete; logs in $OUT"
