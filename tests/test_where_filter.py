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


def test_row_mask_vectorized_no_per_query_python():
    """VERDICT r2 weak #4: after the first masked query per key, the row
    mask must come from cached typed columns — re-querying must NOT iterate
    the metadata dicts again (O(N) Python per query at 10M rows)."""
    from crs_tpu.rag.index import VectorStore

    class _Poison(list):
        armed = False

        def __iter__(self):
            if self.armed:
                raise AssertionError("per-query O(N) metadata iteration")
            return super().__iter__()

    rng = np.random.default_rng(9)
    n = 256
    emb = rng.standard_normal((n, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    chunks = [_Chunk(i, "alpha" if i % 3 == 0 else "beta") for i in range(n)]
    store = VectorStore({"format": "fp32", "block_size": 64})
    store.create_index(chunks, emb)
    q = emb[:2]
    s1, i1 = store.search_batch(q, top_k=4, where={"topic": "alpha"})
    # arm the poison: subsequent masked queries must hit the column cache
    poisoned = _Poison(store.metadatas)
    poisoned.armed = True
    store.metadatas = poisoned
    s2, i2 = store.search_batch(q, top_k=4, where={"topic": "alpha"})
    np.testing.assert_array_equal(i1, i2)


def test_row_mask_typed_columns_semantics():
    """Numeric / string / None / type-mismatch equality matches the old
    dict-loop semantics exactly."""
    from crs_tpu.rag.chunking import Chunk
    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(10)
    n = 64
    emb = rng.standard_normal((n, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    chunks = [
        Chunk(text=f"d{i}", chunk_id=f"c{i}", tokens=i % 4,
              page_number=(i % 5) if i % 2 == 0 else None,
              section=f"s{i % 3}")
        for i in range(n)
    ]
    store = VectorStore({"format": "fp32", "block_size": 64})
    store.create_index(chunks, emb)

    def old_mask(where):
        return {
            idx for idx, md in enumerate(store.metadatas)
            if all(md.get(k) == v for k, v in where.items())
        }

    for where in (
        {"tokens": 2},                       # numeric equality
        {"section": "s1"},                   # string equality
        {"tokens": 2, "section": "s0"},      # conjunction
        {"page_number": -1},                 # None stored as -1 sentinel
        {"tokens": "2"},                     # type mismatch -> no rows
        {"nonexistent_key": 5},              # absent key -> no rows
    ):
        mask, n_allowed = store._row_mask(where)
        got = set(np.flatnonzero(mask[:n]))
        assert got == old_mask(where), (where, got, old_mask(where))
        assert n_allowed == len(got)


def test_where_document_exhaustive_heavy_filter():
    """VERDICT r2 weak #5: a substring matching <1% of the corpus must
    still return top_k results (fixed over-fetch caps under-returned)."""
    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(11)
    n = 1024
    emb = rng.standard_normal((n, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # only 8 of 1024 docs (<1%) contain the needle; make them the WORST
    # matches so no fixed over-fetch window would find them
    texts = [
        f"document {i} needle" if i >= n - 8 else f"document {i}"
        for i in range(n)
    ]
    store = VectorStore({"format": "fp32", "block_size": 64})
    store.create_index(texts, emb)
    q = emb[0]  # closest to row 0, far from the tail needle rows
    res = store.search(q, top_k=5, where_document="needle")
    assert len(res["ids"][0]) == 5
    assert all("needle" in d for d in res["documents"][0])


def test_where_document_fewer_matches_than_k():
    """If the whole corpus has fewer matches than top_k, return them all
    (exhaustive, no infinite widen loop)."""
    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(12)
    n = 300
    emb = rng.standard_normal((n, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    texts = [f"doc {i} rare" if i in (7, 250) else f"doc {i}" for i in range(n)]
    store = VectorStore({"format": "fp32", "block_size": 64})
    store.create_index(texts, emb)
    res = store.search(emb[0], top_k=5, where_document="rare")
    assert sorted(res["documents"][0]) == ["doc 250 rare", "doc 7 rare"]
