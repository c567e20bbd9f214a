#!/usr/bin/env python
"""Retrieval-knob sweep for the strictly-matched context-quality comparison
(VERDICT r2 next #4): find settings that lift sufficiency/coverage on the
reference's own 10-question set at matched context, validating each
candidate on the full 41-question set to avoid overfitting the subset.

Knobs swept: query expansion (terms/weight/threshold), MMR diversity
penalty, hybrid rerank, candidate top_k. Metric definitions are the
reference's exact ones (evaluation/retrieval/benchmark.py, reference
:795-824).

Usage: python tools/quality_sweep.py [--full]
"""
import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)


def run_config(qa, emb_over, ret_over):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark
    from crs_tpu.rag.pipeline import RAGPipeline

    emb = {"backend": "lexical", "embedding_dim": 384, "bm25_k1": 0.6}
    emb.update(emb_over)
    ret = {"top_k": 3, "similarity_threshold": 0.0}
    ret.update(ret_over)
    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": 90,
                     "chunk_overlap": 18, "min_chunk_size": 25},
        "embedding": emb,
        "vector_store": {"format": "int8", "block_size": 128},
        "retrieval": ret,
    }).setup()
    p.index_documents("/root/reference/data/2308.07633v4-clean.pdf")
    out = {}
    for nq in (10, 41):
        b = RetrievalBenchmark(
            p, {"test_questions": qa[:nq], "compare_no_rag": False})
        m = b.run_all().metrics
        out[nq] = (m["context_sufficiency"], m["context_precision"],
                   m["context_coverage"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    qa = json.load(open("/root/reference/data/2308.07633v4-qa.json"))

    grids = [
        # (tag, emb_over, ret_over)
        ("ship", {"expansion_terms": 4, "expansion_weight": 0.3,
                  "expansion_sim_threshold": 0.35}, {}),
        ("noexp", {}, {}),
        ("exp8w5", {"expansion_terms": 8, "expansion_weight": 0.5,
                    "expansion_sim_threshold": 0.25}, {}),
        ("exp8w5+mmr2", {"expansion_terms": 8, "expansion_weight": 0.5,
                         "expansion_sim_threshold": 0.25},
         {"diversity_penalty": 0.2}),
        ("ship+mmr2", {"expansion_terms": 4, "expansion_weight": 0.3,
                       "expansion_sim_threshold": 0.35},
         {"diversity_penalty": 0.2}),
        ("ship+mmr4", {"expansion_terms": 4, "expansion_weight": 0.3,
                       "expansion_sim_threshold": 0.35},
         {"diversity_penalty": 0.4}),
        ("ship+rerank", {"expansion_terms": 4, "expansion_weight": 0.3,
                         "expansion_sim_threshold": 0.35},
         {"rerank": True}),
        ("ship+rerank+mmr2", {"expansion_terms": 4, "expansion_weight": 0.3,
                              "expansion_sim_threshold": 0.35},
         {"rerank": True, "diversity_penalty": 0.2}),
    ]
    if args.full:
        for t, w, thr in itertools.product((4, 8, 16), (0.3, 0.5, 0.8),
                                           (0.15, 0.25)):
            grids.append((f"e{t}w{w}t{thr}",
                          {"expansion_terms": t, "expansion_weight": w,
                           "expansion_sim_threshold": thr}, {}))
        for dp in (0.1, 0.3):
            grids.append((f"mmr{dp}", {"expansion_terms": 4,
                                       "expansion_weight": 0.3,
                                       "expansion_sim_threshold": 0.35},
                          {"diversity_penalty": dp}))

    print(f"{'tag':24s} {'10q suf/prec/cov':>24s} {'41q suf/prec/cov':>24s}")
    print(f"{'reference':24s} {'0.756 0.634 0.716':>24s} {'-':>24s}")
    rows = []
    for tag, emb_over, ret_over in grids:
        r = run_config(qa, emb_over, ret_over)
        s10 = " ".join(f"{x:.3f}" for x in r[10])
        s41 = " ".join(f"{x:.3f}" for x in r[41])
        print(f"{tag:24s} {s10:>24s} {s41:>24s}", flush=True)
        rows.append({"tag": tag, "emb": emb_over, "ret": ret_over,
                     "q10": r[10], "q41": r[41]})
    os.makedirs("results/lexical_quality", exist_ok=True)
    json.dump(rows, open("results/lexical_quality/sweep.json", "w"), indent=1)


if __name__ == "__main__":
    main()
