"""RAG pipeline + generator tests (full end-to-end with the tiny LM)."""

import numpy as np
import pytest

from crs_tpu.models.model_interface import create_model_interface
from crs_tpu.rag.generation import RAGGenerator
from crs_tpu.rag.pipeline import RAGPipeline

DOCS = [
    "Quantization reduces the numeric precision of model weights. "
    "Int8 quantization stores weights in eight bits. "
    "Group-wise scales preserve accuracy at low bit widths.",
    "Pruning removes unimportant connections from a neural network. "
    "Structured pruning removes whole rows or heads. "
    "Unstructured pruning produces sparse matrices.",
    "Knowledge distillation trains a small student model to imitate a large teacher. "
    "The student learns from the teacher's soft label distribution.",
]

CFG = {
    "chunking": {"strategy": "sentence", "chunk_size": 12, "chunk_overlap": 2, "min_chunk_size": 1},
    "embedding": {"backend": "hashed", "embedding_dim": 128},
    "vector_store": {"format": "fp32", "block_size": 128},
    "retrieval": {"top_k": 2, "similarity_threshold": 0.02},
    "generation": {"max_new_tokens": 8, "temperature": 0.0},
}


@pytest.fixture(scope="module")
def pipeline():
    model = create_model_interface("jax", {"config": "tiny"})
    model.load()
    p = RAGPipeline(CFG).setup(model)
    p.index_documents(DOCS)
    return p


def test_index_and_stats(pipeline):
    stats = pipeline.get_stats()
    assert stats["num_documents"] == 3
    assert stats["vector_store"]["num_vectors"] > 3
    assert stats["model"]["num_parameters"] > 0


def test_retrieve_relevance(pipeline):
    chunks = pipeline.retrieve("how does int8 quantization of weights work?")
    assert chunks
    assert "uantization" in chunks[0]["text"] or "eight bits" in chunks[0]["text"]


def test_validate_retrieval(pipeline):
    v = pipeline.validate_retrieval("what is pruning?", ["pruning", "connections"])
    assert v["term_recall"] > 0.4


def test_query_envelope(pipeline):
    out = pipeline.query("what is distillation?", return_context=True, return_chunks=True)
    assert out["question"]
    assert isinstance(out["answer"], str)
    assert "chunks" in out and "context" in out
    assert out["context"]  # retrieved once, context populated


def test_generate_answer_no_rag(pipeline):
    a = pipeline.generate_answer("what is 2+2?", use_rag=False, context="")
    assert isinstance(a, str)


def test_evaluate_with_no_rag_comparison(pipeline):
    qs = [{"question": "what is quantization?"}, {"question": "what is pruning?"}]
    res = pipeline.evaluate(qs, compare_no_rag=True)
    assert len(res["rag_answers"]) == 2
    assert len(res["no_rag_answers"]) == 2
    assert res["retrieval_time_s"] >= 0
    assert all(isinstance(c, str) for c in res["contexts"])


def test_unsetup_pipeline_raises():
    with pytest.raises(RuntimeError):
        RAGPipeline({}).retrieve("x")


def test_empty_documents_raises():
    p = RAGPipeline(CFG).setup()
    with pytest.raises(ValueError):
        p.index_documents([])


# -- generator unit behavior --------------------------------------------------

class FakeModel:
    """Scripted model for exercising cleaning/retry without a real LM."""

    def __init__(self, outputs):
        self.outputs = list(outputs)
        self.calls = 0

    def generate_batch(self, prompts, **kw):
        self.calls += 1
        out = self.outputs[: len(prompts)]
        self.outputs = self.outputs[len(prompts):] or out
        return out


def test_clean_answer_strips_boilerplate():
    g = RAGGenerator(FakeModel([]), {})
    assert g._clean_answer("Answer: the sky is blue.") == "the sky is blue."
    assert g._clean_answer("Based on the context, pruning works.") == "pruning works."


def test_clean_answer_caps_sentences():
    g = RAGGenerator(FakeModel([]), {"max_answer_sentences": 2})
    a = g._clean_answer("One. Two. Three. Four.")
    assert a == "One. Two."


def test_truncate_context_sentence_boundary():
    g = RAGGenerator(FakeModel([]), {"max_context_chars": 50})
    ctx = "First sentence here. Second sentence is long. Third sentence."
    t = g._truncate_context(ctx)
    assert len(t) <= 50
    assert t.endswith(".")


def test_problematic_detection():
    """The reference's three degenerate classes + the fallback allowlist
    (reference rag/generation.py:303-353)."""
    g = RAGGenerator(FakeModel([]), {})
    ctx = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    # class 1: verbatim 10-gram copy from the context
    assert g._is_problematic(
        "alpha beta, gamma delta epsilon zeta eta theta iota kappa plus some extra trailing words", ctx
    )
    # class 2: too short (<15 words, reference threshold)
    assert g._is_problematic("too short", ctx)
    assert g._is_problematic("this answer has exactly fourteen words which is one too few for the check", ctx)
    # class 3: self-repetition (halves contained in each other)
    assert g._is_problematic(
        "one two three four five six seven eight one two three four five six seven eight", ctx
    )
    # honest fallbacks are fine even when short
    assert not g._is_problematic("The context does not specify this.", ctx)
    assert not g._is_problematic("I cannot answer from the given context.", ctx)
    # a genuinely novel long answer passes
    good = ("compression methods trade accuracy for memory and the survey groups "
            "them into pruning quantization distillation and low rank factorization families")
    assert not g._is_problematic(good, ctx)


def test_retry_on_degenerate():
    good = ("a proper answer that contains well over fifteen distinct words so the "
            "degenerate answer detector accepts it without any complaint at all")
    fake = FakeModel(["xx", good])
    g = RAGGenerator(fake, {})
    out = g.generate("question?", "some context")
    assert out == good
    assert fake.calls == 2
