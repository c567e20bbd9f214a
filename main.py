#!/usr/bin/env python
"""CLI entry point (parity: reference main.py:37-58).

    python main.py --config config.json --index doc.pdf
    python main.py --config config.json --query "what is quantization?"
    python main.py --config config.json --evaluate
    python main.py --eval-efficiency | --eval-performance | --eval-retrieval

Includes the reference's keyword heuristic ``should_retrieve`` (main.py:31-35)
deciding RAG vs direct generation for interactive queries.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crs_tpu.models.model_interface import create_model_interface
from crs_tpu.rag.pipeline import RAGPipeline
from crs_tpu.utils.config import ConfigLoader
from crs_tpu.utils.logging_setup import setup_logging

logger = logging.getLogger("main")

_RETRIEVE_KEYWORDS = (
    "what", "how", "why", "when", "where", "who", "which",
    "explain", "describe", "define", "compare", "summarize",
)


def should_retrieve(query: str) -> bool:
    """Keyword heuristic (reference main.py:31-35)."""
    q = query.lower()
    return any(k in q for k in _RETRIEVE_KEYWORDS) or q.endswith("?")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="TPU-native compressed-RAG suite")
    ap.add_argument("--config", default=None, help="config JSON path")
    ap.add_argument("--index", metavar="PATH", help="index a document (pdf/txt/md)")
    ap.add_argument("--query", metavar="TEXT", help="run a single query")
    ap.add_argument("--evaluate", action="store_true", help="run all benchmarks")
    ap.add_argument("--eval-efficiency", action="store_true")
    ap.add_argument("--eval-performance", action="store_true")
    ap.add_argument("--eval-retrieval", action="store_true")
    ap.add_argument("--output-dir", default="results")
    ap.add_argument("--no-model", action="store_true", help="retrieval-only (skip LLM load)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    setup_logging(level=logging.DEBUG if args.verbose else logging.INFO)
    try:
        cfg = ConfigLoader(args.config)
    except FileNotFoundError:
        print(f"error: config file not found: {args.config}", file=sys.stderr)
        return 2

    model = None
    if not args.no_model:
        mc = cfg.get_model_config()
        model = create_model_interface(mc.get("type", "jax"), mc)
        model.load()
        logger.info("model: %s", model.get_model_info())

    pipeline = RAGPipeline(cfg.get_rag_config()).setup(model)

    persist = cfg.get("rag.vector_store.persist_directory")
    if persist and pipeline.store.n > 0:
        logger.info("loaded persisted index (%d vectors)", pipeline.store.n)

    if args.index:
        secs = pipeline.index_documents(args.index)
        print(f"indexed {pipeline.store.n} chunks in {secs:.2f}s")
        return 0

    if args.query:
        if pipeline.store.n == 0:
            print("no index loaded — run --index first (retrieval disabled)")
        use_rag = should_retrieve(args.query) and pipeline.store.n > 0
        out = pipeline.query(args.query, return_context=False, return_chunks=True, use_rag=use_rag)
        for c in out.get("chunks", []):
            print(f"  [{c['score']:.3f}] p{c['metadata'].get('page_number')}: {c['text'][:100]}")
        print(f"\nanswer: {out['answer']}")
        return 0

    any_eval = args.evaluate or args.eval_efficiency or args.eval_performance or args.eval_retrieval
    if any_eval:
        from crs_tpu.evaluation.runner import EvaluationRunner

        eval_cfg = dict(cfg.get_evaluation_config())
        qa_file = cfg.get("evaluation.retrieval.test_questions_file")
        if qa_file and Path(qa_file).exists():
            from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark

            eval_cfg.setdefault("retrieval", {})["test_questions"] = (
                RetrievalBenchmark.load_dataset_file(qa_file)
            )
        # retrieval eval needs an index: build from the configured corpus
        # when the store is empty (otherwise the benchmark raises)
        if args.evaluate or args.eval_retrieval:
            corpus_file = cfg.get("evaluation.retrieval.corpus_file")
            if pipeline.store.n == 0 and corpus_file and Path(corpus_file).exists():
                logger.info("indexing evaluation corpus %s", corpus_file)
                pipeline.index_documents(corpus_file)
        runner = EvaluationRunner(model=model, pipeline=pipeline, config=eval_cfg, output_dir=args.output_dir)
        res = runner.run_all(
            run_efficiency=args.evaluate or args.eval_efficiency,
            run_performance=args.evaluate or args.eval_performance,
            run_retrieval=args.evaluate or args.eval_retrieval,
        )
        print(json.dumps(res.get_summary(), indent=2, default=str))
        return 0

    ap.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
