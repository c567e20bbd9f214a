"""Fused Pallas scan kernels vs the exact XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest


def _normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    return _normalized(rng, 700, 128), _normalized(rng, 5, 128)


def test_pallas_topk_matches_exact(data):
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk
    from crs_tpu.ops.topk import exact_topk

    vectors, queries = data
    s, i = pallas_topk(jnp.asarray(vectors), jnp.asarray(queries), 10, 700, block_size=256)
    ref_s, ref_i = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 10, 700)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-4)


def test_pallas_topk_padding_and_masking(data):
    """valid_n masking: padded rows (even huge-score ones) never selected."""
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk

    vectors, queries = data
    poisoned = np.concatenate([vectors, 10 * np.ones((100, 128), np.float32)])
    s, i = pallas_topk(jnp.asarray(poisoned), jnp.asarray(queries), 8, 700, block_size=256)
    assert np.asarray(i).max() < 700


def test_pallas_topk_bf16(data):
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk
    from crs_tpu.ops.topk import exact_topk

    vectors, queries = data
    s, i = pallas_topk(jnp.asarray(vectors, jnp.bfloat16), jnp.asarray(queries), 10, 700, block_size=256)
    _, ref_i = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 10, 700)
    recall = np.mean([
        len(set(np.asarray(i)[q]) & set(np.asarray(ref_i)[q])) / 10
        for q in range(len(queries))
    ])
    assert recall >= 0.9, recall


def test_pallas_topk_int8_recall(data):
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk_int8
    from crs_tpu.ops.quant import scalar_quantize
    from crs_tpu.ops.topk import exact_topk

    vectors, queries = data
    codes, scales = scalar_quantize(jnp.asarray(vectors))
    s, i = pallas_topk_int8(codes, scales, jnp.asarray(queries), 10, 700, block_size=256)
    _, ref_i = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 10, 700)
    recall = np.mean([
        len(set(np.asarray(i)[q]) & set(np.asarray(ref_i)[q])) / 10
        for q in range(len(queries))
    ])
    assert recall >= 0.8, recall


def test_pallas_topk_single_block():
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk
    from crs_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(9)
    vectors = _normalized(rng, 100, 128)
    queries = _normalized(rng, 3, 128)
    s, i = pallas_topk(jnp.asarray(vectors), jnp.asarray(queries), 5, 100, block_size=128)
    _, ref_i = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 5, 100)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
