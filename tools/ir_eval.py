#!/usr/bin/env python
"""IR-mode evaluation on the bundled corpus with derived relevance judgments.

The reference's published IR metrics are all null — no relevance judgments
were ever provided (SURVEY.md §6 note; fp16_retrieval_results.json:2-15).
This tool derives judgments from the QA set's section labels: a chunk is
relevant to a question iff the chunk's text/section matches the question's
topic section (quantization / pruning / distillation / ...), then runs the
retrieval benchmark in ``ir`` mode to produce real recall@{1,3,5,10} / MRR /
MAP numbers for every index format.

Usage: python tools/ir_eval.py [--out results/ir_mode]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORPUS = "/root/reference/data/2308.07633v4-clean.pdf"
QA = "/root/reference/data/2308.07633v4-qa.json"

# QA section label → keywords that mark a chunk as on-topic
SECTION_KEYWORDS = {
    "quantization": ("quantization", "quantize", "ptq", "qat", "int8", "int4", "bit"),
    "pruning": ("pruning", "prune", "sparsity", "sparse"),
    "distillation": ("distillation", "distill", "teacher", "student"),
    "low-rank factorization": ("low-rank", "factorization", "decompos"),
    "abstract": ("survey", "compression", "large language"),
    "introduction": ("challenge", "gpt", "deployment", "resource"),
    "metrics": ("metric", "flops", "mfu", "inference time", "speedup", "parameter count"),
    "benchmarks": ("benchmark", "evaluat", "harness", "dataset"),
    "conclusion": ("future", "direction", "conclusion"),
}


def build_judgments(chunks, qa):
    """question → relevant chunk ids, by section-keyword matching."""
    judgments = []
    for item in qa:
        section = item.get("section", "").lower()
        keywords = None
        for name, kws in SECTION_KEYWORDS.items():
            if name in section:
                keywords = kws
                break
        if keywords is None:
            keywords = tuple(w for w in section.split() if len(w) > 4) or (section,)
        relevant = [
            c.chunk_id for c in chunks
            if any(kw in c.text.lower() or kw in (c.section or "").lower() for kw in keywords)
        ]
        judgments.append({
            "question": item["question"],
            "answer": item.get("answer", ""),
            "relevant_doc_ids": relevant,
            "section": section,
        })
    return judgments


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/ir_mode")
    ap.add_argument("--formats", nargs="+", default=["fp32", "int8", "pq"])
    args = ap.parse_args()

    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark
    from crs_tpu.rag.chunking import TextChunker
    from crs_tpu.rag.document_processing import DocumentProcessor
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.pipeline import RAGPipeline

    dp = DocumentProcessor({})
    pages = dp.process_file(CORPUS)
    ck = TextChunker({"strategy": "semantic", "chunk_size": 160, "chunk_overlap": 30, "min_chunk_size": 10})
    chunks = []
    for text, page in pages:
        for title, body in dp.extract_sections(text):
            chunks.extend(ck.chunk(body, page_number=page, section=title or None))
    qa = json.load(open(QA))
    judgments = build_judgments(chunks, qa)
    n_with = sum(1 for j in judgments if j["relevant_doc_ids"])
    print(f"{len(chunks)} chunks; {n_with}/{len(judgments)} questions have judgments")

    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    emb = em.embed_chunks(chunks)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "judgments.json").write_text(json.dumps(judgments, indent=2))

    summary = {}
    for fmt in args.formats:
        store = VectorStore({"format": fmt, "block_size": 256, "rescore_k": 64})
        store.create_index(chunks, emb)
        pipe = RAGPipeline({"retrieval": {"top_k": 10, "similarity_threshold": -1.0}}).setup()
        pipe.store = store
        pipe.embedder = em
        from crs_tpu.rag.retrieval import ContextRetriever

        pipe.retriever = ContextRetriever(store, em, {"top_k": 10, "similarity_threshold": -1.0})
        bench = RetrievalBenchmark(pipe, {
            "test_questions": judgments, "compare_no_rag": False,
            "retrieval_warmup": True,
        })
        res = bench.run_all()
        keep = {k: v for k, v in res.metrics.items() if any(
            k.startswith(p) for p in ("precision_at", "recall_at", "f1_at", "mrr", "map",
                                       "avg_retrieval_time", "retrieval_qps"))}
        summary[fmt] = keep
        res.to_json(str(out_dir / f"ir_results_{fmt}.json"))
        print(f"[{fmt}] recall@10={keep.get('recall_at_10'):.3f} mrr={keep.get('mrr'):.3f} "
              f"map={keep.get('map'):.3f}")
    (out_dir / "ir_summary.json").write_text(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
