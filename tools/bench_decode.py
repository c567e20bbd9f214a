#!/usr/bin/env python
"""Pure-decode latency bench: int8 vs int4 weight paths on the real chip.

Measures decode ms/token by differencing two greedy generates (n2 − n1
tokens), which cancels prefill + dispatch overhead — the same methodology as
``evaluation/efficiency/latency.py`` but model-interface-free so we can build
random-weight quantized params directly in packed form (no fp32 intermediate,
minimal tunnel transfer).

Usage: python tools/bench_decode.py --config 1b --bits 4 --batch 1
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_random_quant_params(cfg, bits: int, group_size: int = 128, seed: int = 0):
    """Random params with every weight already in QuantizedTensor form —
    codes drawn directly as integers (timing doesn't depend on values, but
    scales are sized so activations stay in a sane range)."""
    import jax.numpy as jnp

    from crs_tpu.models.quantized import QuantizedTensor

    rng = np.random.default_rng(seed)
    d, hd = cfg.hidden_size, cfg.head_dim

    def qmat(kin: int, kout: int):
        scale_mag = (kin ** -0.5) / (127.0 if bits == 8 else 7.0)
        if bits == 8:
            codes = rng.integers(-127, 128, (kin, kout), dtype=np.int8)
            scales = np.full((kout,), scale_mag, np.float32)
            return QuantizedTensor(jnp.asarray(codes), jnp.asarray(scales), 8, 0, (kin, kout))
        g = kin // group_size if kin % group_size == 0 else 1
        packed = rng.integers(-128, 128, (kin // 2, kout), dtype=np.int16).astype(np.int8)
        scales = np.full((g, kout), scale_mag, np.float32)
        return QuantizedTensor(jnp.asarray(packed), jnp.asarray(scales), 4, kin // g, (kin, kout))

    params = {
        "embed": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, d)).astype(np.float32) * 0.02, cfg.dtype
        ),
        "layers": [],
        "final_norm": {"scale": jnp.ones((d,), cfg.dtype)},
        "lm_head": qmat(d, cfg.vocab_size),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "attn_norm": {"scale": jnp.ones((d,), cfg.dtype)},
                "attn": {
                    "q": qmat(d, cfg.num_heads * hd),
                    "k": qmat(d, cfg.num_kv_heads * hd),
                    "v": qmat(d, cfg.num_kv_heads * hd),
                    "o": qmat(cfg.num_heads * hd, d),
                },
                "mlp_norm": {"scale": jnp.ones((d,), cfg.dtype)},
                "mlp": {
                    "gate": qmat(d, cfg.intermediate_size),
                    "up": qmat(d, cfg.intermediate_size),
                    "down": qmat(cfg.intermediate_size, d),
                },
            }
        )
    return params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="1b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--kv-bits", type=int, default=16, choices=(8, 16))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=40)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--fuse", action="store_true", help="fuse q|k|v and gate|up projections")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from crs_tpu.models.sampling import SamplingParams, generate_tokens
    from crs_tpu.models.transformer import CONFIGS

    import dataclasses

    cfg = CONFIGS[args.config]
    if args.kv_bits != 16:
        cfg = dataclasses.replace(cfg, kv_bits=args.kv_bits)
    print(f"device={jax.devices()[0].device_kind} config={args.config} bits={args.bits} "
          f"kv_bits={args.kv_bits} batch={args.batch}", file=sys.stderr)

    t0 = time.perf_counter()
    params = build_random_quant_params(cfg, args.bits)
    if args.fuse:
        from crs_tpu.models.transformer import fuse_qkv_params

        params = fuse_qkv_params(params)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"params built+transferred in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, args.prefill)), jnp.int32)
    mask = jnp.ones((args.batch, args.prefill), jnp.bool_)
    key = jax.random.PRNGKey(0)

    def run(n_tokens: int) -> float:
        sp = SamplingParams(max_new_tokens=n_tokens, temperature=0.0, eos_id=-1)
        t0 = time.perf_counter()
        toks, lens = generate_tokens(params, cfg, ids, mask, key, sp)
        np.asarray(toks)  # device_get = the only reliable fence on the tunnel
        return time.perf_counter() - t0

    for n in (args.n1, args.n2):  # compile both scan lengths
        t = run(n)
        print(f"warmup n={n}: {t:.2f}s (includes compile)", file=sys.stderr)

    t1s = [run(args.n1) for _ in range(args.runs)]
    t2s = [run(args.n2) for _ in range(args.runs)]
    t1, t2 = float(np.median(t1s)), float(np.median(t2s))
    ms_per_tok = (t2 - t1) * 1000.0 / (args.n2 - args.n1)
    print(json.dumps({
        "config": args.config, "bits": args.bits, "kv_bits": args.kv_bits,
        "batch": args.batch, "prefill": args.prefill,
        "decode_ms_per_token": round(ms_per_tok, 4),
        "tokens_per_sec": round(args.batch * 1000.0 / ms_per_tok, 2),
        "t_n1_s": round(t1, 4), "t_n2_s": round(t2, 4),
    }))


if __name__ == "__main__":
    main()
