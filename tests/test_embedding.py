"""Embedding stack tests: tokenizer parity, MiniLM numerics vs torch BERT."""

import numpy as np
import pytest

from crs_tpu.models.tokenizer import HashTokenizer, WordPieceTokenizer, basic_tokenize
from crs_tpu.rag.embedding import EmbeddingModel, HashedEncoder


# -- basic tokenize ----------------------------------------------------------

def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("naïve café") == ["naive", "cafe"]
    assert basic_tokenize("数学 test") == ["数", "学", "test"]


def test_wordpiece_matches_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "quick", "brown", "fox", "jump", "##s", "##ed", "over",
             "lazy", "dog", "un", "##able", "##iz", "##ation", "quant"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    ours = WordPieceTokenizer.from_vocab_file(str(vp))
    theirs = transformers.BertTokenizer(str(vp), do_lower_case=True)
    for text in [
        "The quick brown fox jumps over the lazy dog",
        "quantization is unable",
        "unknownword the fox",
        "QUICK, fox!",
    ]:
        assert ours.encode(text) == theirs.encode(text), text


def test_hash_tokenizer_deterministic():
    t = HashTokenizer(vocab_size=1000)
    a = t.encode("hello world")
    b = t.encode("hello world")
    assert a == b
    assert a[0] == t.cls_id and a[-1] == t.sep_id
    assert all(HashTokenizer.RESERVED <= i < 1000 for i in a[1:-1])


# -- MiniLM numerics vs torch ------------------------------------------------

def test_minilm_matches_torch_bert():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from crs_tpu.models.minilm import (
        MiniLMConfig, load_hf_bert_params, minilm_hidden_states,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, size=(3, 17)).astype(np.int64)
    mask = np.ones((3, 17), np.int64)
    mask[1, 12:] = 0
    mask[2, 5:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    cfg = MiniLMConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    )
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_hf_bert_params(state, cfg)
    ours = np.asarray(
        minilm_hidden_states(params, cfg, jnp.asarray(ids), jnp.asarray(mask, bool))
    )
    # Compare only unmasked positions (masked positions diverge freely).
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4, rtol=2e-3)


def test_minilm_embed_shapes_and_norm():
    em = EmbeddingModel({"backend": "minilm", "batch_size": 4, "max_length": 64})
    out = em.embed(["hello world", "a much longer sentence about quantization of language models", "x"])
    assert out.shape == (3, 384)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_minilm_batch_order_stable():
    em = EmbeddingModel({"backend": "minilm", "batch_size": 2, "max_length": 64})
    texts = ["short", "a medium length sentence here", "x " * 40, "tiny"]
    full = em.embed(texts)
    single = np.stack([em.embed([t])[0] for t in texts])
    # Different (batch, seq) buckets compile separately; allow fusion noise.
    np.testing.assert_allclose(full, single, atol=5e-4)


# -- hashed encoder ----------------------------------------------------------

def test_hashed_encoder_similarity_signal():
    enc = HashedEncoder(dim=128, seed=0)
    e = enc.encode([
        "weight quantization reduces model size",
        "quantization of model weights shrinks size",
        "the cat sat on the mat",
    ])
    sim_related = float(e[0] @ e[1])
    sim_unrelated = float(e[0] @ e[2])
    assert sim_related > sim_unrelated + 0.2
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_hashed_encoder_deterministic():
    a = HashedEncoder(dim=64, seed=3).encode(["some text"])
    b = HashedEncoder(dim=64, seed=3).encode(["some text"])
    np.testing.assert_array_equal(a, b)


def test_embedding_model_hashed_backend():
    em = EmbeddingModel({"backend": "hashed", "embedding_dim": 384})
    out = em.embed(["query about pruning", "pruning removes weights"])
    assert out.shape == (2, 384)
    assert em.embed([]).shape == (0, 384)
    q = em.embed_query("single")
    assert q.shape == (384,)


def test_embed_chunks_accepts_chunk_objects():
    from crs_tpu.rag.chunking import Chunk

    em = EmbeddingModel({"backend": "hashed"})
    chunks = [Chunk(text="alpha beta", chunk_id="chunk_0"), Chunk(text="gamma", chunk_id="chunk_1")]
    out = em.embed_chunks(chunks)
    assert out.shape == (2, 384)
