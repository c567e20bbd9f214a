#!/usr/bin/env python
"""Prefill MFU on the real chip (VERDICT r4 next #6).

Decode is bandwidth-bound (87% HBM utilization measured in round 4), so the
only regime where an MFU comparison against the reference's published 2.38%
(T4, Mistral-7B FP16, efficiency/flops.py:85-130) is honest is PREFILL —
large batched matmuls on the MXU. This bench builds a random-init model at
production dims and measures batched long-prompt prefill MFU via
``evaluation.efficiency.latency.measure_prefill_mfu``.

Usage: python tools/bench_prefill_mfu.py --config 1b --type int8 --batch 8 --seq 512
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="1b")
    ap.add_argument("--type", default="bf16", choices=("bf16", "int8"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax

    from crs_tpu.evaluation.efficiency.latency import measure_prefill_mfu
    from crs_tpu.models.model_interface import create_model_interface

    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    m = create_model_interface(args.type, {"config": args.config, "max_seq_len": 2048})
    m.load()
    out = measure_prefill_mfu(
        m, batch=args.batch, seq_len=args.seq, num_runs=args.runs,
        dtype="int8" if args.type == "int8" else "bf16")
    out.update({"config": args.config, "type": args.type})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
