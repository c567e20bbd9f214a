#!/usr/bin/env python
"""Per-question diagnosis of the matched-context 10q gap (VERDICT r2 #4):
our picks vs the per-column oracle picks, with the reference's exact metric
definitions. Prints, for each question, our suf/cov, the oracle's, and the
oracle chunks we failed to retrieve (with their retrieval ranks).
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np

TOKEN = re.compile(r"[a-z0-9]+")


def toks(s):
    return set(TOKEN.findall(s.lower()))


def coverage(target, texts):
    t = toks(target)
    if not t:
        return 0.0
    got = set()
    for x in texts:
        got |= t & toks(x)
    return len(got) / len(t)


def sufficiency(answer, texts):
    ctx = " ".join(texts).lower()
    if answer.lower() in ctx:
        return 1.0
    ov = coverage(answer, texts)
    return 1.0 if ov >= 0.8 else ov


def main():
    from crs_tpu.rag.pipeline import RAGPipeline

    qa = json.load(open("/root/reference/data/2308.07633v4-qa.json"))[:10]
    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": 90,
                     "chunk_overlap": 18, "min_chunk_size": 25},
        "embedding": {"backend": "lexical", "embedding_dim": 384, "bm25_k1": 0.6,
                      "expansion_terms": 4, "expansion_weight": 0.3,
                      "expansion_sim_threshold": 0.35},
        "vector_store": {"format": "int8", "block_size": 128},
        "retrieval": {"top_k": 3, "similarity_threshold": 0.0},
    }).setup()
    p.index_documents("/root/reference/data/2308.07633v4-clean.pdf")
    chunks = list(p.store.documents)
    chunk_tok = [toks(c) for c in chunks]

    # wide retrieval: ranks of every chunk per question
    retr = p.retriever
    for qi, item in enumerate(qa):
        q, ans = item["question"], item["answer"]
        res = retr.retrieve_batch([q], top_k=len(chunks))[0]
        ranked = [r["text"] for r in res]
        ours = ranked[:3]
        rank_of = {t: i for i, t in enumerate(ranked)}

        at = toks(ans)
        # oracle for sufficiency/coverage: greedy + exhaustive over best 24
        scored = sorted(range(len(chunks)),
                        key=lambda i: -len(at & chunk_tok[i]))[:24]
        import itertools
        best_cov, best_pick = -1.0, None
        for combo in itertools.combinations(scored, 3):
            texts = [chunks[i] for i in combo]
            c = coverage(ans, texts)
            if c > best_cov:
                best_cov, best_pick = c, combo
        o_texts = [chunks[i] for i in best_pick]
        print(f"\nQ{qi}: {q[:70]}")
        print(f"  ours:   suf={sufficiency(ans, ours):.3f} cov={coverage(ans, ours):.3f}")
        print(f"  oracle: suf={sufficiency(ans, o_texts):.3f} cov={best_cov:.3f}")
        missed = [i for i in best_pick if chunks[i] not in ours]
        for i in missed:
            r = rank_of.get(chunks[i], -1)
            ctk = len(at & chunk_tok[i])
            print(f"  missed chunk #{i} (retrieval rank {r}, {ctk} answer-token hits): "
                  f"{chunks[i][:100]!r}")


if __name__ == "__main__":
    main()
