"""Incremental VectorStore.add: in-place padded-region append (VERDICT r1 #10).

Equality contract: after any sequence of adds, search results must equal a
from-scratch create_index over the same data (fp32/int8 exactly; pq is
codebook-dependent and is tested for recall + the drift-retrain trigger)."""

import numpy as np
import pytest


def _mk(n, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _store(fmt, block=64, **kw):
    from crs_tpu.rag.index import VectorStore

    return VectorStore({"format": fmt, "block_size": block, **kw})


def _search_ids(store, q, k=5):
    s, i = store.search_batch(q, top_k=k)
    return np.asarray(i), np.asarray(s)


@pytest.mark.parametrize("fmt", ["fp32", "bf16", "int8"])
def test_add_equals_rebuild(fmt):
    emb = _mk(150)
    texts = [f"doc {i}" for i in range(150)]
    q = _mk(4, seed=7)

    incremental = _store(fmt)
    incremental.create_index(texts[:50], emb[:50])
    incremental.add(texts[50:90], emb[50:90])
    incremental.add(texts[90:150], emb[90:150])

    scratch = _store(fmt)
    scratch.create_index(texts, emb)

    assert incremental.n == scratch.n == 150
    ii, si = _search_ids(incremental, q)
    ri, rs = _search_ids(scratch, q)
    np.testing.assert_array_equal(ii, ri)
    np.testing.assert_allclose(si, rs, atol=1e-5)
    assert incremental.ids == scratch.ids


def test_add_grows_capacity():
    emb = _mk(200)
    texts = [f"d{i}" for i in range(200)]
    store = _store("fp32", block=64)
    store.create_index(texts[:40], emb[:40])
    cap0 = store._padded_rows()
    assert cap0 == 64
    store.add(texts[40:200], emb[40:200])  # forces growth past 64
    assert store.n == 200
    assert store._padded_rows() >= 200
    assert store._padded_rows() % store.block_size == 0
    # all rows retrievable: self-query returns self as top hit
    ids, _ = _search_ids(store, emb[195:200], k=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(195, 200))


def test_add_padding_never_leaks():
    """Rows in the padding region (zeros / stale writes) must never surface."""
    emb = _mk(70)
    store = _store("int8", block=64)
    store.create_index([f"d{i}" for i in range(70)], emb)
    store.add([f"d{i}" for i in range(70, 75)], _mk(5, seed=3))
    ids, scores = _search_ids(store, _mk(6, seed=9), k=75)
    valid = scores > -1e29
    assert (ids[valid] < store.n).all()


def test_pq_add_uses_existing_codebook_until_drift():
    emb = _mk(256, dim=32)
    texts = [f"d{i}" for i in range(256)]
    store = _store("pq", block=64, pq_subspaces=8, pq_iters=5)
    store.create_index(texts[:128], emb[:128])
    trained0 = store._pq_trained_n
    store.add(texts[128:192], emb[128:192])  # 1.5x — no retrain
    assert store._pq_trained_n == trained0
    assert store.n == 192
    # self-retrieval still works for the incrementally encoded rows
    ids, _ = _search_ids(store, emb[128:136], k=1)
    assert (ids[:, 0] == np.arange(128, 136)).mean() >= 0.75
    store.add(texts[192:256], emb[192:256])  # 2x since training → retrain
    assert store._pq_trained_n == 256


def test_add_into_empty_store_delegates_to_create():
    store = _store("fp32")
    store.add([f"d{i}" for i in range(10)], _mk(10))
    assert store.n == 10
