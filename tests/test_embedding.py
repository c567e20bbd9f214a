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


def test_aux_channels_shift_doc_embedding():
    """Section/neighbor aux channels (round 4) must change the document
    embedding in the direction of the aux text, and leave queries alone."""
    import numpy as np

    from crs_tpu.rag.embedding import LexicalLSAEncoder

    docs = [
        "weights are rounded to int8 scales per row for inference",
        "teacher student transfer of logits improves small models",
        "sparsity removes attention heads and neurons from layers",
    ] * 20
    enc = LexicalLSAEncoder(dim=32, section_weight=0.5)
    enc.fit(docs)
    base = enc.encode(["rounded to int8 scales"])
    with_aux = enc.encode(
        ["rounded to int8 scales"],
        aux_channels=[(["quantization methods"], enc.section_weight)],
    )
    assert not np.allclose(base, with_aux)
    # the aux'd doc moves toward a pure section-title doc
    sec_vec = enc.encode(["quantization methods"])
    assert float(with_aux @ sec_vec.T) > float(base @ sec_vec.T)
    # queries are untouched by aux config
    q1 = enc.encode(["what about int8?"], is_query=True)
    enc2 = LexicalLSAEncoder(dim=32)
    enc2.fit(docs)
    q2 = enc2.encode(["what about int8?"], is_query=True)
    np.testing.assert_allclose(q1, q2, atol=1e-6)


def test_embed_chunks_uses_section_and_neighbors():
    import numpy as np

    from crs_tpu.rag.chunking import Chunk
    from crs_tpu.rag.embedding import EmbeddingModel

    texts = [
        "alpha beta gamma delta content one",
        "epsilon zeta eta theta content two",
        "iota kappa lambda mu content three",
    ] * 10
    chunks = [
        Chunk(text=t, chunk_id=f"c{i}", page_number=1 + i // 15,
              section="Section Title")
        for i, t in enumerate(texts)
    ]
    em_plain = EmbeddingModel({"backend": "lexical", "embedding_dim": 32})
    em_plain.fit(texts)
    plain = em_plain.embed_chunks(chunks)

    em_aux = EmbeddingModel({
        "backend": "lexical", "embedding_dim": 32,
        "section_weight": 0.4, "neighbor_weight": 0.2,
    })
    em_aux.fit(texts)
    aux = em_aux.embed_chunks(chunks)
    assert plain.shape == aux.shape
    assert not np.allclose(plain, aux)


def test_prf_requery_recovers_vocabulary_bridge():
    """Rocchio PRF: a query sharing terms only with a bridge doc must pull
    in the doc that shares terms with the BRIDGE but not the query."""
    import numpy as np

    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever

    docs = (
        ["memory footprint shrinks with quantization rounding int8"] * 3
        + ["rounding int8 scales preserve accuracy at deployment"] * 3
        + ["unrelated cooking recipes with tomatoes and basil"] * 3
    )
    texts = [f"{d} variant {i}" for i, d in enumerate(docs)]
    em = EmbeddingModel({"backend": "lexical", "embedding_dim": 32})
    em.fit(texts)
    store = VectorStore({"format": "fp32", "block_size": 64})
    store.create_index(texts, em.embed_chunks(texts))

    base = ContextRetriever(store, em, {
        "top_k": 6, "similarity_threshold": -1.0, "rerank": False,
        "diversity_penalty": 0.0})
    prf = ContextRetriever(store, em, {
        "top_k": 6, "similarity_threshold": -1.0, "rerank": False,
        "diversity_penalty": 0.0, "prf_beta": 0.5, "prf_k": 2})
    q = "memory footprint quantization"
    r_base = [r["text"] for r in base.retrieve(q)]
    r_prf = [r["text"] for r in prf.retrieve(q)]
    assert len(r_prf) == 6 and set(r_prf) != set()
    # PRF must not surface the unrelated cluster
    assert not any("cooking" in t for t in r_prf[:4])
    # and must rank the bridge-adjacent docs at least as well as baseline
    def rank_of(lst, marker):
        return next((i for i, t in enumerate(lst) if marker in t), len(lst))
    assert rank_of(r_prf, "deployment") <= rank_of(r_base, "deployment")
