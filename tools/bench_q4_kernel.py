#!/usr/bin/env python
"""Microbenchmark int4 GEMV kernel variants (DEPRECATED harness).

WARNING: this tool loops over ONE weight matrix, which under-reports TPU
GEMV throughput ~6x (no cross-weight DMA pipelining) — use
``tools/bench_chain_gemv.py`` for absolute rates; this remains useful only
for RELATIVE comparisons between in-kernel variants at identical shapes.

Isolates where the int4 kernel's time goes: nibble-unpack VPU cost (i32 vs
i16 shifts, none), per-group small dots vs folded-scale big dots. One
matmul shape per run; timed through a jitted .sum() so only a scalar
crosses the tunnel per iteration.

Usage: python tools/bench_q4_kernel.py --k 2048 --n 32000 --r 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q4_kernel_var(xe_ref, xo_ref, xs_ref, codes_ref, scales_ref, out_ref, *,
                   gpt, gs2, unpack, fold):
    kstep = pl.program_id(2)
    packed = codes_ref[:]
    if unpack == "i32":
        p = packed.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p, 28), 28).astype(jnp.int8)
        hi = jnp.right_shift(p, 4).astype(jnp.int8)
    elif unpack == "i16":
        p = packed.astype(jnp.int16)
        lo = jnp.right_shift(jnp.left_shift(p, 12), 12).astype(jnp.int8)
        hi = jnp.right_shift(p, 4).astype(jnp.int8)
    elif unpack == "none":  # perf probe only — wrong numerics
        lo = packed
        hi = packed
    rt = xe_ref.shape[0]
    nt = packed.shape[1]
    if fold:
        # fold scales into bf16 weights (sublane-repeat), 2 big dots per tile
        sl = scales_ref[pl.ds(kstep * gpt, gpt), :]  # [gpt, Nt] f32
        rep = pltpu.repeat(sl, gs2, 0).astype(jnp.bfloat16)  # [Kt2, Nt]
        wlo = lo.astype(jnp.bfloat16) * rep
        whi = hi.astype(jnp.bfloat16) * rep
        acc = jax.lax.dot_general(
            xe_ref[:], wlo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            xo_ref[:], whi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((rt, nt), jnp.float32)
        for grp in range(gpt):
            lo_g = jax.lax.slice_in_dim(lo, grp * gs2, (grp + 1) * gs2, axis=0)
            hi_g = jax.lax.slice_in_dim(hi, grp * gs2, (grp + 1) * gs2, axis=0)
            pe = jax.lax.dot_general(
                xe_ref[:, grp * gs2:(grp + 1) * gs2], lo_g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            po = jax.lax.dot_general(
                xo_ref[:, grp * gs2:(grp + 1) * gs2], hi_g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + (pe + po).astype(jnp.float32) * scales_ref[kstep * gpt + grp, :][None, :]
    acc = acc * xs_ref[:]

    @pl.when(kstep == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kstep > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def build_variant(r, k, n, g, unpack="i32", fold=False, nt=512, kt2_cap=512):
    k2 = k // 2
    gs2 = k2 // g
    gpt = 1
    for cand in range(g, 0, -1):
        if g % cand == 0 and cand * gs2 <= kt2_cap and (cand * gs2) % 128 == 0:
            gpt = cand
            break
    kt2 = gpt * gs2
    rt = max(32, -(-r // 32) * 32)
    xdtype = jnp.bfloat16 if fold else jnp.int8

    def run(xe, xo, xs, codes, scales):
        out = pl.pallas_call(
            partial(_q4_kernel_var, gpt=gpt, gs2=gs2, unpack=unpack, fold=fold),
            grid=(rt // rt, n // nt, k2 // kt2),
            in_specs=[
                pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kt2, nt), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, nt), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rt, nt), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rt, n), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(xe, xo, xs, codes, scales)
        return out.sum()

    rng = np.random.default_rng(0)
    xe = jnp.asarray(rng.integers(-20, 20, (rt, k2)), xdtype)
    xo = jnp.asarray(rng.integers(-20, 20, (rt, k2)), xdtype)
    xs = jnp.ones((rt, 1), jnp.float32)
    codes = jnp.asarray(rng.integers(-128, 128, (k2, n)), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    return run, (xe, xo, xs, codes, scales)


_LOOP_ITERS = 50


def time_fn(run_one, args, iters=_LOOP_ITERS):
    """Time `iters` kernel invocations INSIDE one jit (lax.fori_loop with a
    varying operand so XLA can't CSE) — per-dispatch tunnel latency (~1 ms)
    otherwise swamps the kernel entirely."""
    import jax.lax as lax

    @jax.jit
    def looped(xe, *rest):
        def body(i, carry):
            acc, cur = carry
            out = run_one(cur, *rest)
            return acc + out, cur + jnp.asarray(1, cur.dtype)

        acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0.0), xe))
        return acc

    looped(*args).block_until_ready()
    out = np.asarray(looped(*args))  # warm + value
    t0 = time.perf_counter()
    s = looped(*args)
    np.asarray(s)
    return (time.perf_counter() - t0) / iters, float(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=32)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=32000)
    ap.add_argument("--g", type=int, default=16)
    ap.add_argument("--variants", default="int8,i32,i16,none,fold_i32,fold_i16")
    args = ap.parse_args()
    r, k, n, g = args.r, args.k, args.n, args.g
    int4_bytes = k * n // 2
    print(f"device={jax.devices()[0].device_kind} R={r} K={k} N={n} "
          f"int4={int4_bytes/1e6:.1f}MB int8={k*n/1e6:.1f}MB", file=sys.stderr)

    results = {}
    for var in args.variants.split(","):
        try:
            if var == "int8":
                from crs_tpu.models.quantized import _int8_act_matmul

                rng = np.random.default_rng(0)
                x = jnp.asarray(rng.standard_normal((r, k)), jnp.float32)
                codes = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
                scales = jnp.full((n,), 0.01, jnp.float32)
                fn = lambda a, b, c: _int8_act_matmul(a, b, c).sum()
                dt, _ = time_fn(fn, (x, codes, scales))
                eff = k * n / dt / 1e9
            else:
                fold = var.startswith("fold_")
                unpack = var.split("_")[-1] if fold else var
                fn, fargs = build_variant(r, k, n, g, unpack=unpack, fold=fold)
                dt, _ = time_fn(fn, fargs)
                eff = int4_bytes / dt / 1e9
            results[var] = dt
            print(f"{var:10s}: {dt*1e3:8.3f} ms  ({eff:6.1f} GB/s effective)", flush=True)
        except Exception as e:
            print(f"{var:10s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(json.dumps({k_: round(v * 1e3, 3) for k_, v in results.items()}))


if __name__ == "__main__":
    main()
