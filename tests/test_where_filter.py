"""Metadata `where` filtering: format-native masked search + fused path.

VERDICT r1 #8: filtered queries used to densify the whole corpus to fp32
and silently fall off the fused path."""

import numpy as np
import pytest


class _Chunk:
    def __init__(self, i, topic):
        self.text = f"document {i} about {topic}"
        self.chunk_id = f"c{i}"
        self.topic = topic

    def to_metadata(self):
        return {"topic": self.topic, "i": None}


def _build(fmt, n=300, dim=32, seed=0, **kw):
    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    chunks = [_Chunk(i, "alpha" if i % 3 == 0 else "beta") for i in range(n)]
    store = VectorStore({"format": fmt, "block_size": 64, **kw})
    store.create_index(chunks, emb)
    return store, emb


@pytest.mark.parametrize("fmt", ["fp32", "bf16", "int8", "pq"])
def test_masked_search_matches_bruteforce(fmt):
    kw = {"pq_subspaces": 8, "pq_iters": 5} if fmt == "pq" else {}
    store, emb = _build(fmt, **kw)
    rng = np.random.default_rng(9)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores, ids = store.search_batch(q, top_k=5, where={"topic": "alpha"})
    allowed = {i for i in range(store.n) if i % 3 == 0}
    # every hit satisfies the filter
    assert all(i in allowed for row in ids for i in row if i >= 0)
    # exact formats: top-5 equals the brute-force masked ranking
    if fmt in ("fp32", "int8"):
        ref = (q @ emb.T)
        mask = np.full(store.n, -np.inf)
        mask[list(allowed)] = 0.0
        ref_top = np.argsort(-(ref + mask[None, :]), axis=1)[:, :5]
        assert [set(r) for r in ids] == [set(r) for r in ref_top]


def test_masked_search_no_fp32_densify_int8():
    """int8 masked search must not materialize dense fp32 corpus vectors."""
    from crs_tpu.rag import index as index_mod

    store, _ = _build("int8", n=1024)
    called = {"dense": False}
    orig = index_mod.VectorStore._dense_vectors

    def spy(self):
        called["dense"] = True
        return orig(self)

    index_mod.VectorStore._dense_vectors = spy
    try:
        q = np.random.default_rng(1).standard_normal((2, 32)).astype(np.float32)
        store.search_batch(q, top_k=3, where={"topic": "beta"})
    finally:
        index_mod.VectorStore._dense_vectors = orig
    assert not called["dense"]


def test_masked_search_large_corpus():
    """100k+ rows filtered without densification (memory-safety regression)."""
    store, emb = _build("int8", n=100_352, dim=16)
    q = emb[:3] + 0.001
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores, ids = store.search_batch(q, top_k=3, where={"topic": "alpha"})
    assert ids.shape == (3, 3)
    assert all(i % 3 == 0 for row in ids for i in row)
    # self-retrieval: query ~ row i; rows 0 and 3 qualify (multiples of 3)
    assert ids[0, 0] == 0 and ids[3 % 3, 0] == 0


def test_fused_path_keeps_where_fused():
    """The fused retriever must apply `where` inside the fused program, not
    fall back to the standard path."""
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever

    texts = [f"chunk {i} about {'alpha' if i % 2 else 'beta'} subject" for i in range(40)]
    chunks = [_Chunk(i, "alpha" if i % 2 else "beta") for i in range(40)]
    for i, c in enumerate(chunks):
        c.text = texts[i]
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 64})
    emb = em.embed(texts)
    store = VectorStore({"format": "int8", "block_size": 8})
    store.create_index(chunks, emb)
    r = ContextRetriever(store, em, {"top_k": 4, "similarity_threshold": -1.0, "fused": True})

    # sabotage the fallback: any non-fused call fails the test
    def boom(*a, **kw):
        raise AssertionError("fused path fell back to the standard path")

    r.retrieve_batch = None  # fused is entered via retrieve_batch_fused below
    out = r.retrieve_batch_fused(["alpha subject information"], where={"topic": "alpha"})
    assert out[0], "no results"
    assert all(hit["metadata"]["topic"] == "alpha" for hit in out[0])
    out2 = r.retrieve_batch_fused(["alpha subject information"], where={"topic": "beta"})
    assert all(hit["metadata"]["topic"] == "beta" for hit in out2[0])


@pytest.mark.parametrize("fmt", ["fp32", "int8", "pq"])
def test_mesh_masked_search_matches_bruteforce(fmt):
    """`where` on the mesh-sharded store goes through the format-native
    sharded scans (no full-corpus densify) and matches brute force."""
    import jax.numpy as jnp

    from crs_tpu.parallel.mesh import corpus_mesh
    from crs_tpu.rag.index import VectorStore

    mesh = corpus_mesh(8)
    rng = np.random.default_rng(3)
    n, dim = 400, 32
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    chunks = [_Chunk(i, "alpha" if i % 3 == 0 else "beta") for i in range(n)]
    kw = {"pq_subspaces": 8, "pq_iters": 5} if fmt == "pq" else {}
    store = VectorStore({"format": fmt, "block_size": 64, **kw}, mesh=mesh)
    store.create_index(chunks, emb)
    q = rng.standard_normal((4, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores, ids = store.search_batch(q, top_k=5, where={"topic": "alpha"})
    allowed = {i for i in range(n) if i % 3 == 0}
    assert all(i in allowed for row in ids for i in row if i >= 0)
    if fmt in ("fp32", "int8"):  # exact formats: exact masked ranking
        ref = q @ emb.T
        neg = np.full(n, -np.inf)
        neg[list(allowed)] = 0.0
        ref_top = np.argsort(-(ref + neg[None, :]), axis=1)[:, :5]
        assert [set(r) for r in ids] == [set(r) for r in ref_top]


def test_mesh_masked_search_no_densify():
    """The sharded int8 masked search must not call _dense_vectors."""
    from crs_tpu.parallel.mesh import corpus_mesh
    from crs_tpu.rag import index as index_mod
    from crs_tpu.rag.index import VectorStore

    mesh = corpus_mesh(8)
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((512, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    chunks = [_Chunk(i, "alpha" if i % 3 == 0 else "beta") for i in range(512)]
    store = VectorStore({"format": "int8", "block_size": 64}, mesh=mesh)
    store.create_index(chunks, emb)
    called = {"dense": False}
    orig = index_mod.VectorStore._dense_vectors

    def spy(self):
        called["dense"] = True
        return orig(self)

    index_mod.VectorStore._dense_vectors = spy
    try:
        q = rng.standard_normal((2, 32)).astype(np.float32)
        store.search_batch(q, top_k=3, where={"topic": "beta"})
    finally:
        index_mod.VectorStore._dense_vectors = orig
    assert not called["dense"]
