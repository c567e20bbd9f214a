"""Fused SwiGLU MLP decode kernel vs the shipped XLA int8 path.

The kernel re-quantizes the hidden activations per CHUNK (finer scales than
the XLA path's one scale across all of I), so outputs differ at int8
quantization-noise level — parity is asserted against the fp32 reference:
the fused output must be at least as accurate as the XLA-int8 output
(within slack), not bit-equal to it."""

import numpy as np


def _setup(rng, h, inter, b):
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.3
    norm_scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(h), jnp.float32)

    def qw(k, n):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        s = (np.abs(w).max(axis=0) / 127.0).astype(np.float32)
        codes = np.clip(np.round(w / s[None, :]), -127, 127).astype(np.int8)
        return jnp.asarray(codes), jnp.asarray(s)

    gate_c, gate_s = qw(h, inter)
    up_c, up_s = qw(h, inter)
    down_c, down_s = qw(inter, h)
    return x, norm_scale, (gate_c, gate_s), (up_c, up_s), (down_c, down_s)


def _fp32_ref(x, norm_scale, gate, up, down, eps=1e-5):
    import jax
    import jax.numpy as jnp

    def dq(c, s):
        return c.astype(jnp.float32) * s[None, :]

    xn = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)
    xn = xn * norm_scale[None, :]
    g = xn @ dq(*gate)
    u = xn @ dq(*up)
    return x + (jax.nn.silu(g) * u) @ dq(*down)


def _xla_int8(x, norm_scale, gate, up, down, eps=1e-5):
    import jax
    import jax.numpy as jnp

    from crs_tpu.models.quantized import _int8_act_matmul

    xn = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)
    xn = xn * norm_scale[None, :]
    g = _int8_act_matmul(xn, *gate)
    u = _int8_act_matmul(xn, *up)
    return x + _int8_act_matmul(jax.nn.silu(g) * u, *down)


def test_fused_mlp_matches_int8_path():
    import jax.numpy as jnp

    from crs_tpu.ops.fused_mlp import (
        fused_mlp_int8, fused_mlp_layout, fused_mlp_supported,
    )

    rng = np.random.default_rng(0)
    h, inter, b, chunk = 256, 512, 4, 256
    assert fused_mlp_supported(b, h, inter, chunk)
    x, ns, gate, up, down = _setup(rng, h, inter, b)

    ref = np.asarray(_fp32_ref(x, ns, gate, up, down))
    xla8 = np.asarray(_xla_int8(x, ns, gate, up, down))
    lay = fused_mlp_layout(*gate, *up, *down, chunk=chunk)
    fused = np.asarray(fused_mlp_int8(x, ns, *lay, chunk=chunk))

    assert fused.shape == (b, h)
    scale = np.abs(ref).max()
    err_xla = np.abs(xla8 - ref).max() / scale
    err_fused = np.abs(fused - ref).max() / scale
    # the fused kernel's per-chunk hidden scales are FINER than the XLA
    # path's single per-row scale — allow 2x slack, expect comparable
    assert err_fused <= max(2 * err_xla, 5e-3), (err_fused, err_xla)


def test_fused_mlp_single_chunk_and_row_padding():
    import jax.numpy as jnp

    from crs_tpu.ops.fused_mlp import fused_mlp_int8, fused_mlp_layout

    rng = np.random.default_rng(1)
    h, inter, b = 128, 256, 1  # padded to 8 rows internally
    x, ns, gate, up, down = _setup(rng, h, inter, b)
    lay = fused_mlp_layout(*gate, *up, *down, chunk=256)  # nchunks == 1
    fused = np.asarray(fused_mlp_int8(x, ns, *lay, chunk=256))
    ref = np.asarray(_fp32_ref(x, ns, gate, up, down))
    assert fused.shape == (1, h)
    assert np.abs(fused - ref).max() / np.abs(ref).max() < 0.02


def test_fused_mlp_decode_integration():
    """fuse_mlp_params + routing: a kv8 decode step with the fused layout
    produces logits close to the standard int8 path (per-chunk hidden scales
    differ at int8-noise level), and prefill still works (falls back above
    8 rows... prefill rows = B*S > 8 here)."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.models.quantized import quantize_params
    from crs_tpu.models.transformer import (
        TransformerConfig, decode_step, fuse_mlp_params, init_cache,
        init_params, prefill,
    )

    cfg = TransformerConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=256, max_seq_len=64,
        dtype=jnp.float32, kv_bits=8,
    )
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg), bits=8)
    fused = fuse_mlp_params(params, chunk=128)
    assert "fused" in fused["layers"][0]["mlp"]

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), bool)

    cache0 = init_cache(cfg, 2, 32)
    logits_a, cache_a = prefill(params, cfg, ids, cache0, mask)
    logits_b, cache_b = prefill(fused, cfg, ids, init_cache(cfg, 2, 32), mask)
    tok = jnp.asarray([3, 5], jnp.int32)
    la, _ = decode_step(params, cfg, tok, cache_a)
    lb, _ = decode_step(fused, cfg, tok, cache_b)
    la, lb = np.asarray(la), np.asarray(lb)
    scale = np.abs(la).max()
    assert np.abs(la - lb).max() / scale < 0.05, np.abs(la - lb).max() / scale
    # ranking agreement on the top token
    assert (la.argmax(-1) == lb.argmax(-1)).mean() >= 0.5
