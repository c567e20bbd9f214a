"""True NF4 (nonuniform 4-bit, 16-entry codebook) — VERDICT r4 missing #3.

The reference's NF4 column is bitsandbytes' nonuniform 4-bit
(`/root/reference/models/huggingface_model.py:59` BitsAndBytesConfig
bnb_4bit_quant_type="nf4"); ours is the same codebook with group-wise absmax
scales, a LUT-dequant Pallas decode kernel, and an XLA dequant path for
prefill-sized rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crs_tpu.models.quantized import QuantizedTensor, qmatmul, quantize_tensor
from crs_tpu.ops.qgemm import (
    NF4_LEVELS,
    emulate_nf4_matmul,
    nf4_matmul,
)


def _rand_nf4(rng, k, n, group_size=128, scale=0.1):
    w = rng.standard_normal((k, n)).astype(np.float32) * scale
    return quantize_tensor(w, bits="nf4", group_size=group_size), w


def test_nf4_levels_are_the_bnb_codebook():
    assert NF4_LEVELS.shape == (16,)
    assert NF4_LEVELS[0] == -1.0 and NF4_LEVELS[-1] == 1.0
    assert NF4_LEVELS[7] == 0.0  # exact zero level
    assert np.all(np.diff(NF4_LEVELS) > 0)


def test_nf4_dequant_is_nearest_level():
    rng = np.random.default_rng(0)
    qt, w = _rand_nf4(rng, 256, 128)
    deq = np.asarray(qt.dequantize())
    # every dequantized value must be scale * one of the 16 levels, and that
    # level must be the NEAREST one to w/scale
    scales = np.asarray(qt.scales)
    g = scales.shape[0]
    norm_w = w.reshape(g, -1, 128) / scales[:, None, :]
    norm_d = deq.reshape(g, -1, 128) / scales[:, None, :]
    dist_chosen = np.abs(norm_w - norm_d)
    dist_best = np.min(np.abs(norm_w[..., None] - NF4_LEVELS), axis=-1)
    np.testing.assert_allclose(dist_chosen, dist_best, atol=1e-6)


def test_nf4_beats_uniform_int4_on_gaussian_weights():
    # NF4's levels are normal-quantile-optimal: on gaussian weights its
    # reconstruction MSE must beat uniform int4 at identical bits and groups
    rng = np.random.default_rng(1)
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.05
    q_nf4 = quantize_tensor(w, bits="nf4", group_size=128)
    q_int4 = quantize_tensor(w, bits=4, group_size=128)
    mse_nf4 = float(np.mean((np.asarray(q_nf4.dequantize()) - w) ** 2))
    mse_int4 = float(np.mean((np.asarray(q_int4.dequantize()) - w) ** 2))
    assert mse_nf4 < mse_int4


def test_nf4_storage_is_packed_4bit():
    rng = np.random.default_rng(2)
    qt, _ = _rand_nf4(rng, 512, 256)
    assert qt.codes.dtype == jnp.uint8
    assert qt.codes.shape == (256, 256)  # two nibbles per byte along K
    assert qt.bits == "nf4"


@pytest.mark.parametrize("r,k,n,g", [(1, 256, 128, 128), (5, 512, 384, 128), (32, 1024, 256, 256)])
def test_nf4_kernel_matches_emulation(r, k, n, g):
    rng = np.random.default_rng(3)
    qt, _ = _rand_nf4(rng, k, n, group_size=g)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32))
    got = nf4_matmul(x, qt.codes, qt.scales)
    want = emulate_nf4_matmul(x, qt.codes, qt.scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_nf4_emulation_matches_dequant_reference():
    rng = np.random.default_rng(4)
    qt, _ = _rand_nf4(rng, 512, 256)
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
    approx = np.asarray(emulate_nf4_matmul(x, qt.codes, qt.scales))
    exact = np.asarray(jnp.dot(x, qt.dequantize()))
    denom = np.maximum(np.abs(exact).max(), 1e-6)
    assert np.abs(approx - exact).max() / denom < 0.02


def test_qmatmul_routes_nf4_both_row_regimes():
    rng = np.random.default_rng(5)
    qt, _ = _rand_nf4(rng, 512, 256)
    exact_w = qt.dequantize()
    for rows in (3, 200):  # kernel path / XLA dequant path
        x = jnp.asarray(rng.standard_normal((rows, 512)).astype(np.float32))
        got = np.asarray(qmatmul(x, qt))
        exact = np.asarray(jnp.dot(x, exact_w))
        denom = np.maximum(np.abs(exact).max(), 1e-6)
        assert np.abs(got - exact).max() / denom < 0.02


def test_nf4_matmul_grad_flows():
    rng = np.random.default_rng(6)
    qt, _ = _rand_nf4(rng, 256, 128)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))

    def loss(xx):
        return jnp.sum(nf4_matmul(xx, qt.codes, qt.scales) ** 2)

    gx = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(gx)))
    w = np.asarray(qt.dequantize())
    out = np.asarray(nf4_matmul(x, qt.codes, qt.scales))
    np.testing.assert_allclose(np.asarray(gx), 2.0 * out @ w.T, rtol=5e-2, atol=5e-2)


def test_nf4_checkpoint_roundtrip(tmp_path):
    from crs_tpu.utils.checkpoint import load_pytree, save_pytree

    rng = np.random.default_rng(7)
    qt, _ = _rand_nf4(rng, 256, 128)
    tree = {"layer": {"w": qt}}
    save_pytree(str(tmp_path / "ck"), tree)
    back = load_pytree(str(tmp_path / "ck"))
    qt2 = back["layer"]["w"]
    assert isinstance(qt2, QuantizedTensor) and qt2.bits == "nf4"
    np.testing.assert_array_equal(np.asarray(qt2.codes), np.asarray(qt.codes))
    np.testing.assert_allclose(
        np.asarray(qt2.dequantize()), np.asarray(qt.dequantize()), atol=1e-6)


def test_model_factory_nf4_is_not_int4_alias():
    from crs_tpu.models.model_interface import create_model_interface

    m = create_model_interface("nf4", {"config": "tiny", "max_seq_len": 128})
    assert m.quantization == "nf4"
    m.load()
    leaves = jax.tree.leaves(
        m.params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    qts = [l for l in leaves if isinstance(l, QuantizedTensor)]
    assert qts and all(q.bits == "nf4" for q in qts)
    out = m.generate("hello", max_new_tokens=4)
    assert isinstance(out, str)
