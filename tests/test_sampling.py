"""Sampling filter unit tests: top-k, top-p, repetition penalty."""

import numpy as np
import pytest


def test_top_k_filter():
    import jax.numpy as jnp

    from crs_tpu.models.sampling import _top_k_filter

    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    out = np.asarray(_top_k_filter(logits, 2))
    assert np.isfinite(out[0, :2]).all()
    assert (out[0, 2:] < -1e29).all()
    # disabled when k=0 or k>=vocab
    np.testing.assert_array_equal(np.asarray(_top_k_filter(logits, 0)), np.asarray(logits))
    np.testing.assert_array_equal(np.asarray(_top_k_filter(logits, 10)), np.asarray(logits))


def test_top_p_filter_keeps_nucleus():
    import jax.numpy as jnp

    from crs_tpu.models.sampling import _top_p_filter

    # probs after softmax: dominated by first two entries
    logits = jnp.asarray([[10.0, 9.0, 0.0, -5.0]])
    out = np.asarray(_top_p_filter(logits, 0.9))
    # survivors keep their original logit; masked entries drop below -1e29
    # (isfinite is NOT enough: the -1e30 mask value is finite)
    assert out[0, 0] > -1e29 and out[0, 1] > -1e29
    assert out[0, 2] < -1e29 and out[0, 3] < -1e29
    # near-tied head: top_p=0.9 must keep MORE than the argmax
    tied = jnp.asarray([[2.0, 1.9, 1.8, -5.0]])
    out2 = np.asarray(_top_p_filter(tied, 0.9))
    assert (out2[0, :3] > -1e29).all(), "nucleus collapsed to greedy"
    assert out2[0, 3] < -1e29
    # top_p=1 is a no-op
    np.testing.assert_array_equal(np.asarray(_top_p_filter(logits, 1.0)), np.asarray(logits))


def test_top_p_always_keeps_argmax():
    import jax.numpy as jnp

    from crs_tpu.models.sampling import _top_p_filter

    logits = jnp.asarray([[3.0, 1.0, 0.5]])
    out = np.asarray(_top_p_filter(logits, 0.01))  # tiny nucleus
    assert out[0, 0] > -1e29  # the crossing (max) token survives
    assert (out[0, 1:] < -1e29).all()


def test_repetition_penalty_directions():
    import jax.numpy as jnp

    from crs_tpu.models.sampling import _apply_repetition_penalty

    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seen = jnp.asarray([[True, True, False]])
    out = np.asarray(_apply_repetition_penalty(logits, seen, 2.0))
    assert out[0, 0] == pytest.approx(1.0)   # positive: divided
    assert out[0, 1] == pytest.approx(-4.0)  # negative: multiplied
    assert out[0, 2] == pytest.approx(1.0)   # unseen: untouched


def test_eos_stops_generation():
    """Rows that emit EOS stop producing real tokens."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.models.sampling import SamplingParams, generate_tokens
    from crs_tpu.models.transformer import CONFIGS, init_params

    cfg = CONFIGS["tiny"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    mask = jnp.ones((1, 3), bool)
    # find the greedy first token, then force it to be the EOS id
    sp0 = SamplingParams(max_new_tokens=1, eos_id=-1, pad_id=0)
    first, _ = generate_tokens(params, cfg, ids, mask, jax.random.PRNGKey(0), sp0)
    eos = int(np.asarray(first)[0, 0])

    sp = SamplingParams(max_new_tokens=6, eos_id=eos, pad_id=0)
    tokens, lengths = generate_tokens(params, cfg, ids, mask, jax.random.PRNGKey(0), sp)
    tokens = np.asarray(tokens)
    assert int(lengths[0]) == 1          # stopped right after EOS
    assert (tokens[0, 1:] == 0).all()    # the rest is pad


def test_pipeline_sections_attached(corpus_pdf):
    from crs_tpu.rag.pipeline import RAGPipeline

    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": 120, "chunk_overlap": 20, "min_chunk_size": 5},
        "embedding": {"backend": "hashed", "embedding_dim": 128},
        "vector_store": {"format": "fp32", "block_size": 128},
        "retrieval": {"top_k": 2, "similarity_threshold": 0.02},
    }).setup()
    p.index_documents(str(corpus_pdf))
    sections = {md.get("section") for md in p.store.metadatas}
    assert any(s for s in sections if s)  # at least some section labels
