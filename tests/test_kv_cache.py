"""int8 KV cache: kernel-vs-emulation parity and bf16-cache agreement."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crs_tpu.models.transformer import (
    QuantKVCache,
    TransformerConfig,
    decode_step,
    init_cache,
    init_params,
    prefill,
)
from crs_tpu.ops.decode_attention import (
    decode_attention_int8,
    emulate_decode_attention_int8,
    quantize_kv_rows,
)

CFG = TransformerConfig(
    vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=512, max_seq_len=256,
)


def test_kernel_matches_emulation():
    rng = np.random.default_rng(0)
    b, hkv, g, s, hd = 2, 2, 2, 256, 128
    q = jnp.asarray(rng.standard_normal((b, hkv, g, hd)).astype(np.float32))
    k = rng.standard_normal((b, hkv, s, hd)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, hd)).astype(np.float32)
    kc, ks = quantize_kv_rows(jnp.asarray(k))
    vc, vs = quantize_kv_rows(jnp.asarray(v))
    valid = np.zeros((b, s), np.int8)
    valid[0, :100] = 1
    valid[1, 3:200] = 1
    valid = jnp.asarray(valid)
    got = np.asarray(decode_attention_int8(q, kc, ks, vc, vs, valid))
    want = np.asarray(emulate_decode_attention_int8(q, kc, ks, vc, vs, valid))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert np.all(np.isfinite(got))


def test_emulation_matches_fp_attention():
    """int8 KV attention ≈ exact fp32 attention on the same keys/values."""
    rng = np.random.default_rng(1)
    b, hkv, g, s, hd = 1, 2, 2, 128, 64
    q = rng.standard_normal((b, hkv, g, hd)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, hd)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, hd)).astype(np.float32)
    valid = np.ones((b, s), np.int8)
    kc, ks = quantize_kv_rows(jnp.asarray(k))
    vc, vs = quantize_kv_rows(jnp.asarray(v))
    got = np.asarray(
        emulate_decode_attention_int8(jnp.asarray(q), kc, ks, vc, vs, jnp.asarray(valid))
    )
    scores = np.einsum("bhgd,bhsd->bhgs", q, k) / np.sqrt(hd)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bhgs,bhsd->bhgd", probs, v)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_all_masked_rows_are_zero_not_nan():
    b, hkv, g, s, hd = 1, 1, 2, 128, 128
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, hkv, g, hd)).astype(np.float32))
    kc, ks = quantize_kv_rows(jnp.asarray(rng.standard_normal((b, hkv, s, hd)).astype(np.float32)))
    vc, vs = quantize_kv_rows(jnp.asarray(rng.standard_normal((b, hkv, s, hd)).astype(np.float32)))
    valid = jnp.zeros((b, s), jnp.int8)
    out = np.asarray(decode_attention_int8(q, kc, ks, vc, vs, valid))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_init_cache_kv8_shape_and_alignment():
    cfg = dataclasses.replace(CFG, kv_bits=8)
    cache = init_cache(cfg, 2, 100)
    assert isinstance(cache, QuantKVCache)
    assert cache.k_codes.shape == (2, 2, 2, 128, 64)  # S rounded up to 128
    assert cache.k_scales.shape == (2, 2, 2, 128)
    assert cache.k_codes.dtype == jnp.int8


def test_prefill_decode_kv8_tracks_bf16_cache():
    """End-to-end: logits through the int8 cache track the bf16-cache logits
    (same params, same prompt, left-padding included)."""
    cfg16 = CFG
    cfg8 = dataclasses.replace(CFG, kv_bits=8)
    params = init_params(jax.random.PRNGKey(0), cfg16)
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 512, (2, 24)), np.int32)
    mask = np.ones((2, 24), bool)
    mask[1, :6] = False  # left-pad row 1
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    def run(cfg):
        cache = init_cache(cfg, 2, 64)
        logits, cache = prefill(params, cfg, ids_j, cache, mask_j)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        outs = [np.asarray(logits[:, -1, :])]
        for _ in range(3):
            logits, cache = decode_step(params, cfg, tok, cache)
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return outs

    ref = run(cfg16)
    got = run(cfg8)
    for a, b in zip(ref, got):
        assert np.all(np.isfinite(b))
        denom = np.abs(a).max() + 1e-6
        # int8 KV is near-lossless: demand tight relative agreement
        assert np.abs(a - b).max() / denom < 0.04, np.abs(a - b).max() / denom


def test_generate_tokens_kv8_runs():
    from crs_tpu.models.sampling import SamplingParams, generate_tokens

    cfg8 = dataclasses.replace(CFG, kv_bits=8)
    params = init_params(jax.random.PRNGKey(0), cfg8)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.bool_)
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, eos_id=-1)
    toks, lens = generate_tokens(params, cfg8, ids, mask, jax.random.PRNGKey(1), sp)
    assert toks.shape == (2, 5)
    assert np.all(np.asarray(lens) == 5)
