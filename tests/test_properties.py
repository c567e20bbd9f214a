"""Property-based tests (hypothesis): invariants across random inputs.

SURVEY.md §4 calls for property tests for quantized-scan ≈ exact agreement
and metric math — these cover the core algebraic invariants.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from crs_tpu.evaluation.retrieval.rag_metrics import RAGMetrics
from crs_tpu.evaluation.retrieval.retrieval_metrics import RetrievalMetrics
from crs_tpu.rag.chunking import TextChunker
from crs_tpu.utils.sentences import split_sentences

_words = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=8), min_size=1, max_size=300
)


@settings(max_examples=30, deadline=None)
@given(_words, st.integers(20, 100), st.integers(0, 19))
def test_fixed_chunking_covers_all_words(words, size, overlap):
    text = " ".join(words)
    ch = TextChunker({"strategy": "fixed", "chunk_size": size, "chunk_overlap": overlap, "min_chunk_size": 1})
    chunks = ch.chunk(text)
    rebuilt = [w for c in chunks for w in c.text.split()]
    # every source word appears (overlap may duplicate, never drop)
    assert set(words) <= set(rebuilt)
    assert all(c.tokens <= size for c in chunks)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from("abcde"), min_size=0, max_size=20),
       st.lists(st.sampled_from("abcde"), min_size=0, max_size=20))
def test_ir_metric_bounds(retrieved, relevant):
    for k in (1, 3, 5):
        p = RetrievalMetrics.precision_at_k(retrieved, relevant, k)
        r = RetrievalMetrics.recall_at_k(retrieved, relevant, k)
        f1 = RetrievalMetrics.f1_at_k(retrieved, relevant, k)
        assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
    assert 0.0 <= RetrievalMetrics.mrr(retrieved, relevant) <= 1.0
    assert 0.0 <= RetrievalMetrics.average_precision(retrieved, relevant) <= 1.0


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc .!?", max_size=200))
def test_sentence_split_preserves_content(text):
    sents = split_sentences(text)
    # no content characters lost (modulo whitespace normalization)
    orig = "".join(text.split())
    rebuilt = "".join("".join(s.split()) for s in sents)
    assert rebuilt == orig


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcd ", max_size=80), st.text(alphabet="abcd ", max_size=80))
def test_answer_metric_bounds_and_symmetry(a, b):
    m = RAGMetrics()
    assert 0.0 <= m.token_f1(a, b) <= 1.0
    assert m.token_f1(a, b) == m.token_f1(b, a)  # F1 is symmetric
    assert m.exact_match(a, a) == 1.0
    assert 0.0 <= m.rouge_l(a, b) <= 1.0
    assert 0.0 <= m.faithfulness(a, b) <= 1.0


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 400))
def test_scalar_quant_bounded_error(n):
    import jax.numpy as jnp

    from crs_tpu.ops.quant import scalar_dequantize, scalar_quantize

    rng = np.random.default_rng(n)
    x = rng.standard_normal((4, 32)).astype(np.float32) * rng.uniform(0.01, 100)
    codes, scales = scalar_quantize(jnp.asarray(x))
    back = np.asarray(scalar_dequantize(codes, scales))
    # per-row error bounded by half a quantization step
    step = np.asarray(scales)[:, None]
    assert (np.abs(back - x) <= step * 0.5 + 1e-6).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_featurize_deterministic_and_bounded(seed):
    from crs_tpu.rag.hashed_features import _featurize_py

    rng = np.random.default_rng(seed)
    words = [f"w{rng.integers(0, 50)}" for _ in range(rng.integers(1, 60))]
    text = " ".join(words)
    f1 = _featurize_py(text, 4096)
    f2 = _featurize_py(text, 4096)
    assert f1 == f2
    assert all(0 <= k < 4096 for k in f1)
    assert all(w >= 1.0 for w in f1.values())
