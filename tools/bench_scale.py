#!/usr/bin/env python
"""Corpus-scale retrieval bench: int8 scan at 1M/10M rows on the real chip.

Device-only scan time via in-jit repetition differencing (tunnel dispatch
latency is 1-25 ms and must cancel; STATUS.md methodology). Corpus codes are
generated HOST-side and transferred once.

Usage: python tools/bench_scale.py --rows 10000000 --batch 64 --k 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--rescore-k", type=int, default=128)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block-size", type=int, default=4096)
    ap.add_argument("--kb", type=int, default=0)
    ap.add_argument("--engine", default="pallas", choices=("pallas", "xla"),
                    help="pallas = fused scan kernel (the serving path at scale); "
                         "xla = int8_topk (lax.top_k over [B, N] dominates past ~1M)")
    args = ap.parse_args()
    n, d, b = args.rows, args.dim, args.batch
    print(f"device={jax.devices()[0].device_kind} rows={n} dim={d} "
          f"int8={n*d/1e9:.2f}GB batch={b} k={args.k}", file=sys.stderr)

    from crs_tpu.ops.quant import int8_topk

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    codes_np = rng.integers(-127, 128, (n, d), dtype=np.int8)
    scales_np = (rng.random(n).astype(np.float32) * 0.5 + 0.5) / 127.0
    codes = jnp.asarray(codes_np)
    scales = jnp.asarray(scales_np)
    jax.block_until_ready(codes)
    print(f"built+transferred in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))

    def mk(reps):
        # corpus arrays MUST be jit arguments: closure capture bakes them
        # into the HLO as constants and ships gigabytes in the remote
        # compile request (STATUS.md methodology notes)
        from crs_tpu.ops.pallas_scan import pallas_topk_int8

        @jax.jit
        def f(q0, codes_a, scales_a):
            def body(i, carry):
                acc, qc = carry
                if args.engine == "pallas":
                    s, ids = pallas_topk_int8(
                        codes_a, scales_a, qc, args.k, n,
                        block_size=args.block_size, kb=args.kb,
                    )
                else:
                    s, ids = int8_topk(codes_a, scales_a, qc, args.k, n,
                                       rescore_k=args.rescore_k)
                # fold results into the next query so reps can't be CSE'd
                qc = qc + 1e-6 * s[:, :1]
                return acc + s.sum(), qc

            acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), q0))
            return acc

        return f

    f1, f2 = mk(args.n1), mk(args.n2)
    np.asarray(f1(q, codes, scales)), np.asarray(f2(q, codes, scales))  # compile + warm
    t1s, t2s = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter(); np.asarray(f1(q, codes, scales)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(q, codes, scales)); t2s.append(time.perf_counter() - t0)
    per_scan = (float(np.median(t2s)) - float(np.median(t1s))) / (args.n2 - args.n1)
    per_query_ms = per_scan * 1e3 / b
    print(json.dumps({
        "rows": n, "dim": d, "batch": b, "k": args.k, "engine": args.engine,
        "block_size": args.block_size, "kb": args.kb,
        "scan_ms": round(per_scan * 1e3, 3),
        "ms_per_query": round(per_query_ms, 4),
        "effective_gbps": round(n * d / per_scan / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
