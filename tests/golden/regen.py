#!/usr/bin/env python
"""Regenerate the golden retrieval fixture (run when behavior changes on
purpose; commit the diff deliberately)."""

import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")

from crs_tpu.rag.chunking import TextChunker
from crs_tpu.rag.document_processing import DocumentProcessor
from crs_tpu.rag.embedding import EmbeddingModel
from crs_tpu.rag.index import VectorStore
from crs_tpu.rag.retrieval import ContextRetriever

CORPUS = "/root/reference/data/2308.07633v4-clean.pdf"
QA = "/root/reference/data/2308.07633v4-qa.json"
OUT = pathlib.Path(__file__).parent / "retrieval_golden.json"


def main() -> None:
    dp = DocumentProcessor({})
    pages = dp.process_file(CORPUS)
    ck = TextChunker({"strategy": "semantic", "chunk_size": 160, "chunk_overlap": 30, "min_chunk_size": 10})
    chunks = [c for t, p in pages for c in ck.chunk(t, page_number=p)]
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(chunks, em.embed_chunks(chunks))
    r = ContextRetriever(
        store, em,
        {"top_k": 5, "similarity_threshold": 0.02, "rerank": True, "diversity_penalty": 0.1},
    )
    qa = json.load(open(QA))
    queries = [x["question"] for x in qa[:15]]
    results = r.retrieve_batch(queries)
    golden = {
        "config": {
            "chunking": "semantic/160/30/10",
            "embedding": "hashed-fnv/384/seed0",
            "retrieval": "top5/thresh0.02/rerank0.7/div0.1",
            "num_chunks": len(chunks),
        },
        "queries": [
            {
                "question": q,
                "ids": [c["id"] for c in res],
                "scores": [round(c["score"], 5) for c in res],
            }
            for q, res in zip(queries, results)
        ],
    }
    OUT.write_text(json.dumps(golden, indent=2))
    print(f"wrote {OUT} ({len(golden['queries'])} queries, {len(chunks)} chunks)")


if __name__ == "__main__":
    main()
