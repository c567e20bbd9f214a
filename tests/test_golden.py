"""Golden regression: frozen (query → ranked chunk ids) on the bundled corpus.

SURVEY.md §7 slice 0: the golden fixture is the parity oracle — any change to
chunking, hashing, embedding, scan, rerank or MMR that alters retrieval
results for the bundled QA corpus shows up here. Regenerate deliberately with
``python tests/golden/regen.py`` when behavior changes on purpose.
"""

import json
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "retrieval_golden.json"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("golden fixture not generated")
    return json.loads(GOLDEN.read_text())


@pytest.fixture(scope="module")
def current(corpus_pdf, golden):
    from crs_tpu.rag.chunking import TextChunker
    from crs_tpu.rag.document_processing import DocumentProcessor
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever

    dp = DocumentProcessor({})
    pages = dp.process_file(str(corpus_pdf))
    ck = TextChunker({"strategy": "semantic", "chunk_size": 160, "chunk_overlap": 30, "min_chunk_size": 10})
    chunks = [c for t, p in pages for c in ck.chunk(t, page_number=p)]
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(chunks, em.embed_chunks(chunks))
    r = ContextRetriever(store, em, {"top_k": 5, "similarity_threshold": 0.02, "rerank": True, "diversity_penalty": 0.1})
    queries = [g["question"] for g in golden["queries"]]
    return chunks, r.retrieve_batch(queries)


def test_chunk_count_stable(golden, current):
    chunks, _ = current
    assert len(chunks) == golden["config"]["num_chunks"]


def test_retrieval_ids_match_golden(golden, current):
    _, results = current
    for g, res in zip(golden["queries"], results):
        ids = [c["id"] for c in res]
        assert ids == g["ids"], (g["question"], ids, g["ids"])


def test_retrieval_scores_match_golden(golden, current):
    _, results = current
    for g, res in zip(golden["queries"], results):
        scores = [c["score"] for c in res]
        np.testing.assert_allclose(scores, g["scores"], atol=1e-4)


def test_retrieval_deterministic(current, golden):
    """Repeat retrieval → identical results (the reference's consistency
    check, retrieval/benchmark.py:725, strengthened to exact determinism)."""
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever

    chunks, first = current
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(chunks, em.embed_chunks(chunks))
    r = ContextRetriever(store, em, {"top_k": 5, "similarity_threshold": 0.02, "rerank": True, "diversity_penalty": 0.1})
    queries = [g["question"] for g in golden["queries"]]
    again = r.retrieve_batch(queries)
    assert [[c["id"] for c in res] for res in again] == [[c["id"] for c in res] for res in first]


def test_fused_matches_standard_on_golden_queries(golden, current):
    """The fused single-dispatch path must rank the golden queries exactly
    like the standard (reference-parity) path on the real corpus."""
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever

    chunks, standard_results = current
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(chunks, em.embed_chunks(chunks))
    r = ContextRetriever(store, em, {"top_k": 5, "similarity_threshold": 0.02,
                                     "rerank": True, "diversity_penalty": 0.1})
    queries = [g["question"] for g in golden["queries"]]
    fused = r.retrieve_batch_fused(queries)
    for s, f in zip(standard_results, fused):
        # exact token-id matching on device → identical ranking
        assert [c["id"] for c in s] == [c["id"] for c in f]
