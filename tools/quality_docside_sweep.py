#!/usr/bin/env python
"""Index-side semantic-lever sweep for the strict 10q matched-context gap
(VERDICT r3 #4): section-title features, neighbor-context features, and
document-side PPMI expansion — all levers the reference's MiniLM gets "for
free" from semantic matching, rebuilt lexically at index time.

Baseline to beat (reference MiniLM, 10q matched ctx, BASELINE.md):
sufficiency 0.756 / precision 0.634 / coverage 0.716.
Ours shipping (round 3): 0.727 / 0.617 / 0.640.

Usage: python tools/quality_docside_sweep.py [--stage 1|2] [--out FILE]
Stage 1 sweeps each lever alone; stage 2 combines the stage-1 winners.
"""
import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

QA_PATH = "/root/reference/data/2308.07633v4-qa.json"
PDF = "/root/reference/data/2308.07633v4-clean.pdf"

# shipping round-3 embedding base (config.json)
BASE_EMB = {
    "backend": "lexical", "embedding_dim": 384, "bm25_k1": 0.6,
    "expansion_terms": 4, "expansion_weight": 0.3,
    "expansion_sim_threshold": 0.35,
}


def run_config(emb_overrides, qa, chunk=(90, 18, 25)):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark
    from crs_tpu.rag.pipeline import RAGPipeline

    cs, ov, ms = chunk
    emb = dict(BASE_EMB)
    emb.update(emb_overrides)
    retr = {"top_k": 3, "similarity_threshold": 0.0}
    retr.update(emb.pop("_retrieval", {}))  # "_retrieval" key = retriever knobs
    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": cs,
                     "chunk_overlap": ov, "min_chunk_size": ms},
        "embedding": emb,
        "vector_store": {"format": "int8", "block_size": 128},
        "retrieval": retr,
    }).setup()
    p.index_documents(PDF)
    row = {"emb": emb_overrides}
    for nq in (10, 41):
        b = RetrievalBenchmark(p, {"test_questions": qa[:nq], "compare_no_rag": False})
        m = b.run_all().metrics
        row[f"{nq}q"] = {
            "suf": round(m["context_sufficiency"], 4),
            "prec": round(m["context_precision"], 4),
            "cov": round(m["context_coverage"], 4),
            "ctx_chars": round(m["avg_context_length_chars"], 0),
        }
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--out", default="results/lexical_quality/docside_sweep.json")
    ap.add_argument("--configs", default=None,
                    help="JSON list of emb-override dicts (overrides stage)")
    args = ap.parse_args()
    qa = json.load(open(QA_PATH))

    if args.configs:
        grid = json.loads(args.configs)
    elif args.stage == 1:
        grid = [{}]  # shipping baseline for reference
        grid += [{"section_weight": w} for w in (0.15, 0.3, 0.45, 0.6)]
        grid += [{"neighbor_weight": w} for w in (0.1, 0.2, 0.3)]
        grid += [{"doc_expansion_terms": 4, "doc_expansion_weight": w}
                 for w in (0.1, 0.2)]
    else:  # stage 2: combinations (edit after stage 1)
        sw = (0.3, 0.45)
        nw = (0.0, 0.1, 0.2)
        de = ((0, 0.0), (4, 0.1))
        grid = [
            {"section_weight": s, "neighbor_weight": n,
             "doc_expansion_terms": t, "doc_expansion_weight": w}
            for s, n, (t, w) in itertools.product(sw, nw, de)
        ]

    rows = []
    for cfg in grid:
        row = run_config(cfg, qa)
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = []
    if os.path.exists(args.out):
        existing = json.load(open(args.out))
    json.dump(existing + rows, open(args.out, "w"), indent=1)
    print(f"wrote {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
