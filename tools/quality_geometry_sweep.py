#!/usr/bin/env python
"""Chunk-geometry sweep at MATCHED total context (VERDICT r2 #4): the
comparison row holds avg context chars ≈ the reference's (~1.5k); within
that budget the chunk size / top_k split is a free retrieval-design axis.
Finer chunks + more of them buy union coverage if the retriever can rank
them; this sweep measures that trade on the 10q and 41q sets.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)


def run(qa, cs, ov, ms, top_k, nq):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark
    from crs_tpu.rag.pipeline import RAGPipeline

    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": cs,
                     "chunk_overlap": ov, "min_chunk_size": ms},
        "embedding": {"backend": "lexical", "embedding_dim": 384, "bm25_k1": 0.6,
                      "expansion_terms": 4, "expansion_weight": 0.3,
                      "expansion_sim_threshold": 0.35},
        "vector_store": {"format": "int8", "block_size": 128},
        "retrieval": {"top_k": top_k, "similarity_threshold": 0.0},
    }).setup()
    p.index_documents("/root/reference/data/2308.07633v4-clean.pdf")
    b = RetrievalBenchmark(p, {"test_questions": qa[:nq],
                               "compare_no_rag": False})
    m = b.run_all().metrics
    return (m["avg_context_length_chars"], m["context_sufficiency"],
            m["context_precision"], m["context_coverage"])


def main():
    qa = json.load(open("/root/reference/data/2308.07633v4-qa.json"))
    geoms = [
        (90, 18, 25, 3),   # current matched row
        (60, 12, 18, 5),
        (45, 9, 14, 6),
        (45, 9, 14, 7),
        (30, 6, 10, 9),
        (30, 6, 10, 10),
        (60, 12, 18, 4),
        (22, 4, 8, 13),
    ]
    print(f"{'geom':18s} {'ctx':>6s} {'10q suf/prec/cov':>22s} {'41q suf/prec/cov':>22s}")
    print(f"{'reference':18s} {'~1500':>6s} {'0.756 0.634 0.716':>22s} {'':>22s}")
    rows = []
    for cs, ov, ms, k in geoms:
        c10, s10, p10, v10 = run(qa, cs, ov, ms, k, 10)
        c41, s41, p41, v41 = run(qa, cs, ov, ms, k, 41)
        tag = f"cs{cs}/ov{ov}/k{k}"
        print(f"{tag:18s} {c10:6.0f} {s10:.3f} {p10:.3f} {v10:.3f}        "
              f"{s41:.3f} {p41:.3f} {v41:.3f}", flush=True)
        rows.append({"cs": cs, "ov": ov, "ms": ms, "k": k,
                     "ctx10": c10, "q10": [s10, p10, v10],
                     "ctx41": c41, "q41": [s41, p41, v41]})
    json.dump(rows, open("results/lexical_quality/geometry_sweep.json", "w"),
              indent=1)


if __name__ == "__main__":
    main()
