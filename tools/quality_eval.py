"""Retrieval-quality parity runs against BASELINE.md (VERDICT r1 item 1).

Runs the RetrievalBenchmark with the corpus-fitted lexical encoder on the
bundled survey corpus + 41-question QA set, at the shipping default chunking
(240 words) and at a context length matched to the reference's (~1.5k chars),
on both the full 41-question set and the first-10 subset the reference
published. Writes raw JSONs to results/lexical_quality/.

Usage: python tools/quality_eval.py [--cpu]
"""
import argparse, json, os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--output-dir", default="results/lexical_quality")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from crs_tpu.rag.pipeline import RAGPipeline
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark

    qa = json.load(open("/root/reference/data/2308.07633v4-qa.json"))
    os.makedirs(args.output_dir, exist_ok=True)
    rows = []
    for tag, (cs, ov, ms) in (("default240", (240, 48, 50)),
                              ("matched-ctx90", (90, 18, 25))):
        p = RAGPipeline({
            "chunking": {"strategy": "semantic", "chunk_size": cs,
                         "chunk_overlap": ov, "min_chunk_size": ms},
            "embedding": {"backend": "lexical", "embedding_dim": 384,
                          # shipping defaults (config.json): mild PPMI+SVD
                          # query expansion (+0.012 prec on 10q) and
                          # bm25_k1=0.6 (+0.013 prec on 10q, +0.002/+0.006/
                          # +0.002 on 41q — measured sweeps, STATUS r3)
                          "bm25_k1": 0.6,
                          "expansion_terms": 4, "expansion_weight": 0.3,
                          "expansion_sim_threshold": 0.35},
            "vector_store": {"format": "int8", "block_size": 128},
            "retrieval": {"top_k": 3, "similarity_threshold": 0.0},
        }).setup()
        p.index_documents("/root/reference/data/2308.07633v4-clean.pdf")
        for nq in (41, 10):
            b = RetrievalBenchmark(p, {"test_questions": qa[:nq], "compare_no_rag": False})
            m = b.run_all().metrics
            m["config"] = {"chunking": tag, "chunk_size_words": cs, "num_questions": nq,
                           "backend": "lexical", "format": "int8", "top_k": 3}
            rows.append(m)
            out = os.path.join(args.output_dir, f"retrieval_quality_{tag}_{nq}q.json")
            json.dump(m, open(out, "w"), indent=1)
            print(f"{tag} {nq}q: ctx={m['avg_context_length_chars']:.0f}ch "
                  f"suf={m['context_sufficiency']:.3f} prec={m['context_precision']:.3f} "
                  f"cov={m['context_coverage']:.3f} score={m['avg_retrieval_score']:.3f} -> {out}")
    return rows


if __name__ == "__main__":
    main()
