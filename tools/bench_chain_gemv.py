#!/usr/bin/env python
"""Chained-GEMV bench: decode-realistic weight streaming.

Methodology notes (each learned the hard way on the axon tunnel):
- chain DISTINCT weights with a data dependency, like a decode step;
- weights must be jit ARGUMENTS (stacked, lax.scan over the layer dim) —
  closure-captured arrays become HLO constants, which both inflates the
  remote-compile request (HTTP 413 past ~100 MB) and lets XLA cache them;
- cancel dispatch latency (1-25 ms, varies) by differencing two in-jit
  repetition counts; per-call timing is pure noise;
- size the weight set well past VMEM (~100 MB) or the chain re-runs from
  on-chip memory and reports >HBM rates.

Variants:
  int8    XLA int8 dot (the shipped int8 decode path)
  q4      the shipped Pallas int4 kernel (MXU, folded bf16 scales)
  dq4     XLA int4: unpack nibbles + dequant + dot (materializes bf16)

Usage: python tools/bench_chain_gemv.py --d 2048 --layers 96 --r 8
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
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=96)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--g", type=int, default=16, help="int4 scale groups")
    ap.add_argument("--reps", type=int, default=5, help="timed repetitions")
    ap.add_argument("--n1", type=int, default=1, help="short in-jit rep count")
    ap.add_argument("--n2", type=int, default=5, help="long in-jit rep count")
    ap.add_argument("--variants", default="int8,q4,dq4")
    args = ap.parse_args()
    d, L, r = args.d, args.layers, args.r
    w_mb_int8 = L * d * d / 1e6
    print(f"device={jax.devices()[0].device_kind} d={d} L={L} R={r} "
          f"int8={w_mb_int8:.0f}MB int4={w_mb_int8/2:.0f}MB", file=sys.stderr)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    out = {}

    def timed_chain(step, wstack):
        """step(x, w_slice) -> x. wstack: pytree with leading layer dim,
        passed as a jit ARG and scanned over. Returns s/chain."""

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
        np.asarray(f1(x0, wstack)), np.asarray(f2(x0, wstack))  # compile + warm
        t1s, t2s = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); np.asarray(f1(x0, wstack)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f2(x0, wstack)); t2s.append(time.perf_counter() - t0)
        t1, t2 = float(np.median(t1s)), float(np.median(t2s))
        return (t2 - t1) / (args.n2 - args.n1)

    for var in args.variants.split(","):
        try:
            if var == "int8":
                from crs_tpu.models.quantized import _int8_act_matmul

                ws = {
                    "codes": jnp.asarray(rng.integers(-127, 128, (L, d, d)), jnp.int8),
                    "scales": jnp.full((L, d), 1e-2 / d**0.5, jnp.float32),
                }
                dt = timed_chain(lambda x, w: _int8_act_matmul(x, w["codes"], w["scales"]), ws)
                eff = L * d * d / dt / 1e9

            elif var == "q4":
                from crs_tpu.ops.qgemm import q4_matmul

                ws = {
                    "codes": jnp.asarray(rng.integers(-128, 128, (L, d // 2, d)), jnp.int8),
                    "scales": jnp.full((L, args.g, d), 1e-2 / d**0.5, jnp.float32),
                }
                dt = timed_chain(lambda x, w: q4_matmul(x, w["codes"], w["scales"]), ws)
                eff = L * d * d / 2 / dt / 1e9

            elif var == "dq4":
                from crs_tpu.models.quantized import QuantizedTensor

                ws = {
                    "codes": jnp.asarray(rng.integers(-128, 128, (L, d // 2, d)), jnp.int8),
                    "scales": jnp.full((L, args.g, d), 1e-2 / d**0.5, jnp.float32),
                }

                def stepdq(x, w):
                    qt = QuantizedTensor(w["codes"], w["scales"], 4, d // args.g, (d, d))
                    return jnp.dot(
                        x.astype(jnp.bfloat16), qt.dequantize().astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

                dt = timed_chain(stepdq, ws)
                eff = L * d * d / 2 / dt / 1e9
            elif var == "i4native":
                # XLA s4 dot: does XLA:TPU keep int4 packed in HBM and
                # unpack in the dot emitter? If yes this streams ~2x int8.
                ws = {
                    "codes": jnp.asarray(rng.integers(-8, 8, (L, d, d)), jnp.int4),
                }
                xq0 = jnp.asarray(rng.integers(-100, 100, (r, d)), jnp.int8)

                def stepi4(x, w):
                    acc = jax.lax.dot_general(
                        x.astype(jnp.int8), w["codes"],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return acc.astype(jnp.float32) * (1e-2 / d**0.5)

                dt = timed_chain(stepi4, ws)
                eff = L * d * d / 2 / dt / 1e9

            elif var == "q8pallas":
                # Pallas int8 GEMV with the q4 kernel's exact block/grid
                # structure but NO unpack and ONE dot — isolates whether the
                # deficit is Pallas/MXU-at-small-M or the VPU unpack.
                from functools import partial as _partial

                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                kt, nt = 512, 512

                def k8(x_ref, codes_ref, scales_ref, out_ref):
                    kstep = pl.program_id(2)
                    w = codes_ref[:].astype(jnp.bfloat16)
                    acc = jax.lax.dot_general(
                        x_ref[:], w,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                    @pl.when(kstep == 0)
                    def _():
                        out_ref[:] = acc * scales_ref[0, :][None, :]

                    @pl.when(kstep > 0)
                    def _():
                        out_ref[:] = out_ref[:] + acc * scales_ref[0, :][None, :]

                rt8 = 16

                def q8mm(x, codes, scales):
                    rr = x.shape[0]
                    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, rt8 - rr), (0, 0)))
                    o = pl.pallas_call(
                        k8,
                        grid=(1, d // nt, d // kt),
                        in_specs=[
                            pl.BlockSpec((rt8, kt), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                            pl.BlockSpec((kt, nt), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, nt), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec((rt8, nt), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((rt8, d), jnp.float32),
                        interpret=jax.default_backend() != "tpu",
                    )(xp, codes, scales)
                    return o[:rr]

                ws = {
                    "codes": jnp.asarray(rng.integers(-127, 128, (L, d, d)), jnp.int8),
                    "scales": jnp.full((L, 1, d), 1e-2 / d**0.5, jnp.float32),
                }
                dt = timed_chain(lambda x, w: q8mm(x, w["codes"], w["scales"]), ws)
                eff = L * d * d / dt / 1e9
            elif var == "pldb":
                # MANUAL double-buffered DMA (round 3, VERDICT r2 weak #7
                # probe): the 350 GB/s cap of the Pallas decode-row kernels
                # was measured with the AUTOMATIC grid pipeline; this streams
                # the weight from HBM with explicit make_async_copy double
                # buffering (pallas_guide "Double Buffering") — if it reaches
                # XLA's ~990 GB/s, a fused decode layer is viable; if it caps
                # too, the fused-layer idea dies by arithmetic.
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                ck = 512
                nchunks = d // ck
                rt = 8

                def kdb(x_ref, w_hbm, out_ref):
                    def body(scratch, sems):
                        def get_dma(slot, ci):
                            return pltpu.make_async_copy(
                                w_hbm.at[pl.ds(ci * ck, ck)],
                                scratch.at[slot],
                                sems.at[slot],
                            )

                        get_dma(0, 0).start()

                        def loop(ci, _):
                            slot = ci % 2

                            @pl.when(ci + 1 < nchunks)
                            def _():
                                get_dma((ci + 1) % 2, ci + 1).start()

                            get_dma(slot, ci).wait()
                            w = scratch[slot].astype(jnp.bfloat16)  # [ck, d]
                            acc = jax.lax.dot_general(
                                x_ref[:], w,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [rt, ck]
                            out_ref[ci] = acc
                            return 0

                        jax.lax.fori_loop(0, nchunks, loop, 0)

                    pl.run_scoped(
                        body,
                        scratch=pltpu.VMEM((2, ck, d), jnp.int8),
                        sems=pltpu.SemaphoreType.DMA((2,)),
                    )

                def dbmm(x, codes):
                    rr = x.shape[0]
                    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, rt - rr), (0, 0)))
                    o = pl.pallas_call(
                        kdb,
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pl.ANY),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct(
                            (nchunks, rt, ck), jnp.float32),
                        interpret=jax.default_backend() != "tpu",
                    )(xp, codes)
                    # [nchunks, rt, ck] -> [rr, d]
                    return o.transpose(1, 0, 2).reshape(rt, d)[:rr] * (1e-2 / d**0.5)

                ws = {"codes": jnp.asarray(
                    rng.integers(-127, 128, (L, d, d)), jnp.int8)}
                if "--check" in sys.argv or True:
                    xt = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
                    want = jnp.dot(
                        xt.astype(jnp.bfloat16),
                        ws["codes"][0].astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32,
                    ) * (1e-2 / d**0.5)
                    got = dbmm(xt, ws["codes"][0])
                    err = float(jnp.max(jnp.abs(got - want)))
                    assert err < 1e-2 * float(jnp.max(jnp.abs(want))), err
                dt = timed_chain(lambda x, w: dbmm(x, w["codes"]), ws)
                eff = L * d * d / dt / 1e9
            else:
                continue
            out[var] = round(dt * 1e3, 4)
            print(f"{var:6s}: {dt*1e3:8.3f} ms/chain  ({eff:6.1f} GB/s effective)", flush=True)
        except Exception as e:
            print(f"{var:6s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
