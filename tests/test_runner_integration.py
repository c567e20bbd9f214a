"""Full evaluation-runner integration: all three benchmarks over the tiny LM."""

import json
import os

import pytest

from crs_tpu.evaluation.runner import ComprehensiveResults, EvaluationRunner
from crs_tpu.models.model_interface import create_model_interface
from crs_tpu.rag.pipeline import RAGPipeline

DOCS = [
    "Quantization reduces numeric precision of weights. Int8 stores weights in eight bits.",
    "Pruning removes unimportant connections. Structured pruning removes whole heads.",
    "Distillation trains a student model to imitate a teacher model's predictions.",
]

QUESTIONS = [
    {"question": "What does quantization reduce?", "answer": "numeric precision of weights"},
    {"question": "What does pruning remove?", "answer": "unimportant connections"},
]


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    model = create_model_interface("jax", {"config": "tiny"})
    model.load()
    pipeline = RAGPipeline({
        "chunking": {"strategy": "sentence", "chunk_size": 12, "chunk_overlap": 2, "min_chunk_size": 1},
        "embedding": {"backend": "hashed", "embedding_dim": 128, "batch_size": 8},
        "vector_store": {"format": "int8", "block_size": 128},
        "retrieval": {"top_k": 2, "similarity_threshold": 0.02},
        "generation": {"max_new_tokens": 6, "temperature": 0.0},
    }).setup(model)
    pipeline.index_documents(DOCS)
    out = str(tmp_path_factory.mktemp("results"))
    cfg = {
        "efficiency": {"num_warmup": 1, "num_runs": 2, "max_new_tokens": 4, "batch_sizes": (1, 2)},
        "performance": {
            "perplexity": {"texts": ["the quick brown fox jumps over the lazy dog again and again"], "max_samples": 2},
            "tasks": {"corpus_qa_mc": {"enabled": True}},
            "task_limit": 3,
        },
        "retrieval": {"test_questions": QUESTIONS, "compare_no_rag": True},
    }
    return EvaluationRunner(model=model, pipeline=pipeline, config=cfg, output_dir=out)


def test_run_all(runner):
    res = runner.run_all()
    assert isinstance(res, ComprehensiveResults)
    assert res.errors == {}, res.errors
    # efficiency
    assert res.efficiency["latency_ms_per_token"] > 0
    assert res.efficiency["throughput_tokens_per_sec"] > 0
    assert res.efficiency["num_parameters"] > 0
    assert res.efficiency["gflops_per_token"] > 0
    assert res.efficiency["energy_per_token_mj"] > 0
    # performance
    assert res.performance["perplexity"] > 1
    assert "corpus_qa_mc" in res.performance["tasks"]
    # retrieval
    assert res.retrieval["mode"] == "qa"
    assert res.retrieval["avg_retrieval_time_ms"] > 0
    assert res.retrieval["f1_score"] is not None
    assert "f1_improvement" in res.retrieval
    # persistence
    files = os.listdir(runner.output_dir)
    for f in ("efficiency_results.json", "performance_results.json",
              "retrieval_results.json", "comprehensive_results.json", "summary.json"):
        assert f in files
    summary = json.load(open(os.path.join(runner.output_dir, "summary.json")))
    assert "latency_ms_per_token" in summary


def test_single_benchmark_entry_points(runner, tmp_path):
    res = runner.run_retrieval_only()
    assert res.retrieval is not None
    # in a FRESH output dir (no prior results), skipped pillars stay None
    fresh = EvaluationRunner(
        model=runner.model, pipeline=runner.pipeline,
        config=runner.config, output_dir=str(tmp_path),
    )
    res2 = fresh.run_retrieval_only()
    assert res2.retrieval is not None
    assert res2.efficiency is None


def test_runner_without_model_records_error(tmp_path):
    r = EvaluationRunner(model=None, pipeline=None, output_dir=str(tmp_path))
    res = r.run_all()
    assert "efficiency" in res.errors
    assert "retrieval" in res.errors


def test_retrieval_ablation(runner):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark

    bench = RetrievalBenchmark(runner.pipeline, {"test_questions": QUESTIONS, "compare_no_rag": False})
    study = bench.ablation_study(k_values=(1, 2))
    assert len(study["rows"]) == 2
    assert study["best_k"] in (1, 2)
    # retriever top_k restored
    assert runner.pipeline.retriever.top_k == 2


def test_detailed_response_capture(runner, tmp_path):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark

    bench = RetrievalBenchmark(runner.pipeline, {
        "test_questions": QUESTIONS,
        "save_detailed_responses": True,
        "output_dir": str(tmp_path / "detail"),
        "compare_no_rag": False,
    })
    bench.run_all()
    files = os.listdir(tmp_path / "detail")
    assert "detailed_responses.json" in files
    assert "detailed_responses.txt" in files
    assert "detailed_responses.csv" in files
    details = json.load(open(tmp_path / "detail" / "detailed_responses.json"))
    assert len(details) == 2
    assert details[0]["retrieved_chunks"]


def test_ir_mode(runner):
    from crs_tpu.evaluation.retrieval.benchmark import RetrievalBenchmark

    # label chunks: find which chunk ids the store assigned
    store = runner.pipeline.store
    quant_ids = [store.ids[i] for i, d in enumerate(store.documents) if "uantization" in d]
    qs = [{"question": "What does quantization reduce?", "relevant_doc_ids": quant_ids}]
    bench = RetrievalBenchmark(runner.pipeline, {"test_questions": qs, "compare_no_rag": False})
    res = bench.run_all()
    assert res.metrics["mode"] == "ir"
    assert res.metrics["recall_at_3"] > 0
    assert "mrr" in res.metrics


def test_partial_run_preserves_prior_results(runner):
    """A partial run (one pillar) must not blank the other pillars'
    previously persisted metrics in the comprehensive summary."""
    full = runner.run_all()
    assert full.efficiency is not None
    partial = runner.run_retrieval_only()
    # efficiency metrics were reloaded from disk, not blanked
    assert partial.efficiency is not None
    assert partial.efficiency["latency_ms_per_token"] > 0
    summary = partial.get_summary()
    assert "latency_ms_per_token" in summary
