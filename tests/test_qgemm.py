"""Fused int4 matmul kernel: parity with its XLA emulation, routing, VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crs_tpu.models.quantized import QuantizedTensor, qmatmul, quantize_tensor
from crs_tpu.ops.qgemm import (
    _tile_config,
    emulate_q4_matmul,
    q4_matmul,
    q4_pallas_supported,
)


def _rand_qt(rng, k, n, group_size=128):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    return quantize_tensor(w, bits=4, group_size=group_size), w


@pytest.mark.parametrize("r,k,n,g", [(1, 256, 128, 128), (5, 512, 384, 128), (32, 1024, 256, 256)])
def test_kernel_matches_emulation(r, k, n, g):
    rng = np.random.default_rng(0)
    qt, _ = _rand_qt(rng, k, n, group_size=g)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32))
    got = q4_matmul(x, qt.codes, qt.scales)
    want = emulate_q4_matmul(x, qt.codes, qt.scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_emulation_matches_dequant_reference():
    # the int8-activation emulation must agree with a plain dequantized
    # matmul up to activation-quantization error (~1% relative)
    rng = np.random.default_rng(1)
    qt, _ = _rand_qt(rng, 512, 256)
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
    approx = np.asarray(emulate_q4_matmul(x, qt.codes, qt.scales))
    exact = np.asarray(jnp.dot(x, qt.dequantize()))
    denom = np.maximum(np.abs(exact).max(), 1e-6)
    assert np.abs(approx - exact).max() / denom < 0.02


def test_tile_config_rules():
    assert _tile_config(256, 512, 2) is not None  # gs2=128
    assert _tile_config(256, 512, 4) is not None  # gs2=64 → gpt 2/4
    assert _tile_config(256, 100, 2) is None  # N not 128-aligned
    assert _tile_config(64, 512, 1) is None  # K tile below lane width
    assert q4_pallas_supported(4, 1024, 512, 8)
    assert not q4_pallas_supported(512, 1024, 512, 8)  # prefill-sized rows


def test_qmatmul_routes_int4_small_rows():
    rng = np.random.default_rng(2)
    qt, w = _rand_qt(rng, 512, 256)
    x = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32))
    got = np.asarray(qmatmul(x, qt))
    exact = np.asarray(jnp.dot(x, qt.dequantize()))
    denom = np.maximum(np.abs(exact).max(), 1e-6)
    assert np.abs(got - exact).max() / denom < 0.02


def test_q4_matmul_grad_flows():
    rng = np.random.default_rng(3)
    qt, _ = _rand_qt(rng, 256, 128)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))

    def loss(xx):
        return jnp.sum(q4_matmul(xx, qt.codes, qt.scales) ** 2)

    gx = jax.grad(loss)(x)
    assert gx.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(gx)))
    # backward is the dense dequant path: check against numerical reference
    w = np.asarray(qt.dequantize())
    out = np.asarray(q4_matmul(x, qt.codes, qt.scales))
    want = 2.0 * out @ w.T
    np.testing.assert_allclose(np.asarray(gx), want, rtol=5e-2, atol=5e-2)


def test_decode_step_int4_kernel_matches_dequant_path():
    """End-to-end: prefill (rows > 64, XLA dequant path) composes with decode
    (rows = B, fused kernel path), and the kernel-path decode logits track the
    XLA-dequant decode logits to activation-quantization tolerance.

    (Token-level fp-vs-int4 agreement is NOT asserted: a tiny random-init
    model has near-flat logits that int4 noise legitimately reorders.)"""
    import crs_tpu.ops.qgemm as qg
    from crs_tpu.models.quantized import quantize_params
    from crs_tpu.models.transformer import (
        TransformerConfig, decode_step, init_cache, init_params, prefill,
    )

    cfg = TransformerConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, bits=4, group_size=128)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 40)), jnp.int32)

    def one_decode_logits(p):
        cache = init_cache(cfg, 2, 64)
        logits, cache = prefill(p, cfg, ids, cache)  # 80 rows → XLA path
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        l2, _ = decode_step(p, cfg, tok, cache)  # 2 rows → kernel path
        return np.asarray(l2)

    kernel_logits = one_decode_logits(qparams)
    assert np.all(np.isfinite(kernel_logits))

    # force the XLA dequant path everywhere and re-trace
    orig = qg.q4_pallas_supported
    qg.q4_pallas_supported = lambda *a, **k: False
    try:
        decode_step.clear_cache()
        prefill.clear_cache()
        xla_logits = one_decode_logits(qparams)
    finally:
        qg.q4_pallas_supported = orig
        decode_step.clear_cache()
        prefill.clear_cache()

    denom = np.maximum(np.abs(xla_logits).max(), 1e-6)
    assert np.abs(kernel_logits - xla_logits).max() / denom < 0.05
