"""Vector index + scan op tests: oracle parity, quantized recall, persistence."""

import numpy as np
import pytest

from crs_tpu.rag.chunking import Chunk
from crs_tpu.rag.index import VectorStore


def _normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _numpy_topk(vectors, queries, k):
    scores = queries @ vectors.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    vectors = _normalized(rng, 1500, 64)
    queries = _normalized(rng, 8, 64)
    return vectors, queries


# -- ops ---------------------------------------------------------------------

def test_exact_topk_matches_numpy(data):
    import jax.numpy as jnp

    from crs_tpu.ops.topk import exact_topk

    vectors, queries = data
    s, i = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 10, vectors.shape[0])
    ref_s, ref_i = _numpy_topk(vectors, queries, 10)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-5)


def test_exact_topk_padding_masked(data):
    import jax.numpy as jnp

    from crs_tpu.ops.topk import exact_topk

    vectors, queries = data
    padded = np.concatenate([vectors, np.ones((100, 64), np.float32) * 10], axis=0)
    s, i = exact_topk(jnp.asarray(padded), jnp.asarray(queries), 10, vectors.shape[0])
    assert np.asarray(i).max() < vectors.shape[0]


def test_blockwise_topk_matches_exact(data):
    import jax.numpy as jnp

    from crs_tpu.ops.topk import blockwise_topk, exact_topk

    vectors, queries = data
    s1, i1 = exact_topk(jnp.asarray(vectors), jnp.asarray(queries), 7, vectors.shape[0])
    s2, i2 = blockwise_topk(jnp.asarray(vectors), jnp.asarray(queries), 7, vectors.shape[0], block_size=256)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_int8_topk_recall(data):
    import jax.numpy as jnp

    from crs_tpu.ops.quant import int8_topk, scalar_quantize

    vectors, queries = data
    codes, scales = scalar_quantize(jnp.asarray(vectors))
    s, i = int8_topk(codes, scales, jnp.asarray(queries), 10, vectors.shape[0], rescore_k=50)
    _, ref_i = _numpy_topk(vectors, queries, 10)
    # recall@10 of the int8+rescore path vs exact
    recall = np.mean([
        len(set(np.asarray(i)[q]) & set(ref_i[q])) / 10 for q in range(len(queries))
    ])
    assert recall >= 0.9, recall


def test_scalar_quant_roundtrip():
    import jax.numpy as jnp

    from crs_tpu.ops.quant import scalar_dequantize, scalar_quantize

    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    codes, scales = scalar_quantize(jnp.asarray(x))
    back = np.asarray(scalar_dequantize(codes, scales))
    assert np.abs(back - x).max() < np.abs(x).max() / 100


def test_int4_grouped_roundtrip():
    import jax.numpy as jnp

    from crs_tpu.ops.quant import dequantize_int4_grouped, quantize_int4_grouped

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 32)).astype(np.float32)
    codes, scales = quantize_int4_grouped(jnp.asarray(w), group_size=64)
    assert scales.shape == (4, 32)
    back = np.asarray(dequantize_int4_grouped(codes, scales, group_size=64))
    # int4 is coarse: relative error bounded by half a quant step per group
    assert np.abs(back - w).max() < np.abs(w).max() / 7 + 1e-6


def test_merge_topk():
    import jax.numpy as jnp

    from crs_tpu.ops.topk import merge_topk

    scores = jnp.asarray([[[0.9, 0.5], [0.8, 0.7]]])  # [B=1, S=2, k=2]
    ids = jnp.asarray([[[0, 1], [100, 101]]])
    s, i = merge_topk(scores, ids, 3)
    np.testing.assert_allclose(np.asarray(s)[0], [0.9, 0.8, 0.7])
    np.testing.assert_array_equal(np.asarray(i)[0], [0, 100, 101])


def test_kmeans_converges():
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import kmeans

    rng = np.random.default_rng(1)
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 5
    points = np.concatenate([
        centers[i] + 0.05 * rng.standard_normal((50, 8)).astype(np.float32)
        for i in range(4)
    ])
    out = np.asarray(kmeans(jax.random.PRNGKey(0), jnp.asarray(points), 4, 20))
    # every true center should have a centroid within 0.2
    for c in centers:
        assert np.min(np.linalg.norm(out - c, axis=1)) < 0.2


def test_pq_recall():
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import pq_adc_topk, pq_encode, train_pq

    # Clustered data (the realistic embedding regime for PQ; i.i.d. gaussian
    # is PQ's worst case and not representative of sentence embeddings).
    rng = np.random.default_rng(7)
    centers = _normalized(rng, 20, 64)
    vectors = np.concatenate([
        c + 0.15 * rng.standard_normal((60, 64)).astype(np.float32) for c in centers
    ])
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    queries = vectors[rng.choice(len(vectors), 8, replace=False)] + 0.05 * rng.standard_normal((8, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    cb = train_pq(jax.random.PRNGKey(0), jnp.asarray(vectors), num_subspaces=8, num_clusters=64)
    codes = pq_encode(cb, jnp.asarray(vectors))
    s, i = pq_adc_topk(cb, codes, jnp.asarray(queries), 50, vectors.shape[0])
    _, ref_i = _numpy_topk(vectors, queries, 10)
    # exact top-10 should mostly appear in the PQ top-50 candidates
    recall = np.mean([
        len(set(np.asarray(i)[q]) & set(ref_i[q])) / 10 for q in range(len(queries))
    ])
    assert recall >= 0.8, recall


# -- store -------------------------------------------------------------------

def _chunks(n):
    return [
        Chunk(text=f"document number {i}", chunk_id=f"chunk_{i}", page_number=i % 5, tokens=3)
        for i in range(n)
    ]


@pytest.mark.parametrize("fmt", ["fp32", "bf16", "int8", "pq"])
def test_store_formats_agree(fmt, data):
    vectors, queries = data
    store = VectorStore({"format": fmt, "block_size": 256, "rescore_k": 64, "pq_clusters": 64})
    store.create_index(_chunks(len(vectors)), vectors)
    s, i = store.search_batch(queries, top_k=5)
    assert s.shape == (8, 5) and i.shape == (8, 5)
    _, ref_i = _numpy_topk(vectors, queries, 5)
    recall = np.mean([
        len(set(i[q]) & set(ref_i[q])) / 5 for q in range(len(queries))
    ])
    min_recall = {"fp32": 1.0, "bf16": 0.9, "int8": 0.9, "pq": 0.55}[fmt]
    assert recall >= min_recall, (fmt, recall)


def test_store_search_envelope(data):
    vectors, queries = data
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(_chunks(len(vectors)), vectors)
    res = store.search(queries[0], top_k=3)
    assert len(res["ids"][0]) == 3
    assert res["documents"][0][0].startswith("document number")
    assert res["similarities"][0] == sorted(res["similarities"][0], reverse=True)
    assert abs(res["distances"][0][0] - (1 - res["similarities"][0][0])) < 1e-6


def test_store_where_filter(data):
    vectors, queries = data
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(_chunks(len(vectors)), vectors)
    res = store.search(queries[0], top_k=5, where={"page_number": 2})
    assert all(md["page_number"] == 2 for md in res["metadatas"][0])
    assert len(res["ids"][0]) == 5


def test_store_persistence(tmp_path, data):
    vectors, queries = data
    store = VectorStore({"format": "int8", "block_size": 256})
    store.create_index(_chunks(len(vectors)), vectors)
    s1, i1 = store.search_batch(queries, top_k=4)
    store.save(str(tmp_path))
    store2 = VectorStore({"format": "int8", "persist_directory": str(tmp_path)})
    assert store2.n == store.n
    s2, i2 = store2.search_batch(queries, top_k=4)
    np.testing.assert_array_equal(i1, i2)


def test_store_empty_and_reset(data):
    vectors, _ = data
    store = VectorStore({"format": "fp32"})
    s, i = store.search_batch(np.zeros((2, 64), np.float32), top_k=3)
    assert s.shape == (2, 0)
    store.create_index(_chunks(10), vectors[:10])
    assert store.get_stats()["num_vectors"] == 10
    store.reset()
    assert store.get_stats()["num_vectors"] == 0


def test_store_memory_compression(data):
    vectors, _ = data
    fp = VectorStore({"format": "fp32", "block_size": 256})
    fp.create_index(_chunks(len(vectors)), vectors)
    q8 = VectorStore({"format": "int8", "block_size": 256})
    q8.create_index(_chunks(len(vectors)), vectors)
    assert q8.memory_bytes() < fp.memory_bytes() / 3


def test_int8_topk_pallas_routing_parity():
    """At >= _PALLAS_SCAN_MIN_ROWS the routed scan (Pallas candidates +
    rescore) must match the XLA body — ids exactly, incl. row_mask and the
    -1/masked candidate handling."""
    import jax.numpy as jnp

    from crs_tpu.ops.quant import (
        _PALLAS_SCAN_MIN_ROWS, _int8_topk_xla, int8_topk, scalar_quantize,
    )

    rng = np.random.default_rng(7)
    n = _PALLAS_SCAN_MIN_ROWS  # smallest routed size
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    codes, scales = scalar_quantize(jnp.asarray(v))
    q = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.5)
    valid = n - 37  # padding tail

    for rk in (0, 128):
        s_r, i_r = int8_topk(codes, scales, q, 10, valid, rescore_k=rk, row_mask=mask)
        s_x, i_x = _int8_topk_xla(codes, scales, q, 10, valid, rescore_k=rk, row_mask=mask)
        np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_x))
        np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_x), rtol=1e-5, atol=1e-5)


def test_int8_blockwise_fallback_matches_dense():
    """The memory-bounded blockwise fallback body (round 5: the dense [B, N]
    branch inside lax.cond allocated 13.2 GB at B=256/10M even when never
    taken) must produce the dense body's exact results, mask included."""
    import jax.numpy as jnp
    import numpy as np

    from crs_tpu.ops.quant import (
        _int8_topk_xla, _int8_topk_xla_blockwise, scalar_quantize,
    )

    rng = np.random.default_rng(11)
    v = rng.standard_normal((1000, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    codes, scales = scalar_quantize(jnp.asarray(v))
    q = jnp.asarray(v[:7] + 0.01 * rng.standard_normal((7, 64)).astype(np.float32))
    mask = jnp.asarray(rng.random(1000) > 0.3)
    s_d, i_d = _int8_topk_xla(codes, scales, q, 10, 970, rescore_k=0, row_mask=mask)
    s_b, i_b = _int8_topk_xla_blockwise(
        codes, scales, q, 10, 970, row_mask=mask, block_size=128)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_b), rtol=1e-6)


def test_blockwise_topk_row_mask():
    import jax.numpy as jnp
    import numpy as np

    from crs_tpu.ops.topk import blockwise_topk, exact_topk

    rng = np.random.default_rng(12)
    v = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    mask = jnp.asarray(rng.random(500) > 0.5)
    s_e, i_e = exact_topk(jnp.asarray(v), jnp.asarray(q), 8, 480, row_mask=mask)
    s_b, i_b = blockwise_topk(jnp.asarray(v), jnp.asarray(q), 8, 480,
                              block_size=64, row_mask=mask)
    np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_b))
