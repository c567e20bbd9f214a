#!/usr/bin/env python
"""Fused-MLP decode kernel vs the shipped XLA int8 path (VERDICT r2 weak #7).

Chain methodology from tools/bench_chain_gemv.py: L DISTINCT layers with a
data dependency, weights as jit ARGUMENTS (lax.scan over the stacked layer
dim), dispatch latency cancelled by differencing two in-jit repetition
counts. Weight set sized past VMEM so the chain streams from HBM.

Usage: python tools/bench_fused_mlp.py --h 4096 --inter 14336 --layers 8
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
    ap.add_argument("--h", type=int, default=4096)
    ap.add_argument("--inter", type=int, default=14336)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=5)
    args = ap.parse_args()
    h, inter, L = args.h, args.inter, args.layers
    bytes_per_layer = 3 * inter * h
    print(f"device={jax.devices()[0].device_kind} H={h} I={inter} L={L} "
          f"b={args.b} int8={L*bytes_per_layer/1e6:.0f}MB", file=sys.stderr)

    from crs_tpu.models.quantized import _int8_act_matmul
    from crs_tpu.ops.fused_mlp import fused_mlp_int8, fused_mlp_layout

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((args.b, h)), jnp.float32) * 0.3
    nchunks = inter // args.chunk

    def qw(k, n):
        codes = rng.integers(-127, 128, (L, k, n), dtype=np.int8)
        scales = np.full((L, n), 1e-2 / k ** 0.5, np.float32)
        return codes, scales

    gate_c, gate_s = qw(h, inter)
    up_c, up_s = qw(h, inter)
    down_c, down_s = qw(inter, h)
    norm = np.ones((L, h), np.float32)

    ws_xla = {
        "gate_c": jnp.asarray(gate_c), "gate_s": jnp.asarray(gate_s),
        "up_c": jnp.asarray(up_c), "up_s": jnp.asarray(up_s),
        "down_c": jnp.asarray(down_c), "down_s": jnp.asarray(down_s),
        "norm": jnp.asarray(norm),
    }
    ws_fused = {
        "gate_t": jnp.asarray(gate_c.transpose(0, 2, 1).copy()),
        "gate_s2": jnp.asarray(gate_s.reshape(L, nchunks, args.chunk)),
        "up_t": jnp.asarray(up_c.transpose(0, 2, 1).copy()),
        "up_s2": jnp.asarray(up_s.reshape(L, nchunks, args.chunk)),
        "down_c": jnp.asarray(down_c), "down_s": jnp.asarray(down_s),
        "norm": jnp.asarray(norm),
    }

    def step_xla(x, w):
        xn = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-5)
        xn = xn * w["norm"][None, :]
        g = _int8_act_matmul(xn, w["gate_c"], w["gate_s"])
        u = _int8_act_matmul(xn, w["up_c"], w["up_s"])
        return x + _int8_act_matmul(jax.nn.silu(g) * u, w["down_c"], w["down_s"])

    def step_fused(x, w):
        return fused_mlp_int8(
            x, w["norm"], w["gate_t"], w["gate_s2"], w["up_t"], w["up_s2"],
            w["down_c"], w["down_s"], chunk=args.chunk,
        )

    def timed_chain(step, wstack):
        def mk(reps):
            @jax.jit
            def f(x, ws):
                def body(i, x):
                    def layer(xc, w):
                        return step(xc, w), None

                    x, _ = jax.lax.scan(layer, x, ws)
                    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x)) + 1e-6)

                return jax.lax.fori_loop(0, reps, body, x).sum()

            return f

        f1, f2 = mk(args.n1), mk(args.n2)
        np.asarray(f1(x0, wstack)), np.asarray(f2(x0, wstack))
        t1s, t2s = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); np.asarray(f1(x0, wstack)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f2(x0, wstack)); t2s.append(time.perf_counter() - t0)
        return (float(np.median(t2s)) - float(np.median(t1s))) / (args.n2 - args.n1)

    out = {}
    for name, step, ws in (("xla_int8", step_xla, ws_xla),
                           ("fused", step_fused, ws_fused)):
        try:
            dt = timed_chain(step, ws)
            eff = L * bytes_per_layer / dt / 1e9
            out[name] = {"ms_per_layer": round(dt * 1e3 / L, 4),
                         "gbps_effective": round(eff, 1)}
            print(f"{name:9s}: {dt*1e3/L:7.3f} ms/layer  ({eff:6.1f} GB/s eff)",
                  flush=True)
        except Exception as e:
            print(f"{name:9s}: FAILED {type(e).__name__}: {str(e)[:200]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
