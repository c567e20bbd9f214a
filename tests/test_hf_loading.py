"""End-to-end gated-loader tests with locally saved HF checkpoints.

The zero-egress image can't download weights, but torch/transformers can
SAVE tiny random checkpoints locally — which exercises the full production
load path: config.json parsing, safetensors/bin state dicts, weight
conversion, tokenizer loading.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def mistral_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("mistral_ckpt")
    cfg = transformers.MistralConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(cfg).eval()
    model.save_pretrained(str(d))
    return str(d), model


def test_load_hf_causal_lm_matches_torch(mistral_ckpt):
    import jax.numpy as jnp

    from crs_tpu.models.hf_loader import load_hf_causal_lm
    from crs_tpu.models.transformer import forward

    path, model = mistral_ckpt
    loaded = load_hf_causal_lm(path, dtype=jnp.float32)
    assert loaded is not None
    cfg, params = loaded
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2

    ids = np.random.default_rng(0).integers(0, 97, (2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)


def test_jaxmodel_model_path_roundtrip(mistral_ckpt):
    from crs_tpu.models.model_interface import create_model_interface

    path, _ = mistral_ckpt
    m = create_model_interface("jax", {"model_path": path})
    m.load()
    assert m.cfg.vocab_size == 97
    out = m.forward(np.array([[1, 2, 3]], np.int32))
    assert out.shape == (1, 3, 97)
    info = m.get_model_info()
    assert info["model_name"] == path


def test_jaxmodel_model_path_quantized(mistral_ckpt):
    from crs_tpu.models.model_interface import create_model_interface

    path, _ = mistral_ckpt
    m = create_model_interface("int8", {"model_path": path})
    m.load()
    assert m.quantization == "int8"
    full = create_model_interface("jax", {"model_path": path})
    full.load()
    ids = np.array([[4, 5, 6, 7]], np.int32)
    c = np.corrcoef(full.forward(ids).ravel(), m.forward(ids).ravel())[0, 1]
    assert c > 0.98


def test_minilm_checkpoint_loading(tmp_path):
    import jax.numpy as jnp

    from crs_tpu.models.minilm import MiniLMConfig, minilm_hidden_states
    from crs_tpu.rag.embedding import _load_local_checkpoint

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=40,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg).eval()
    model.save_pretrained(str(tmp_path))
    # write a vocab for the WordPiece tokenizer
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world", "##s"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    cfg = MiniLMConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    )
    params, tokenizer = _load_local_checkpoint(str(tmp_path), cfg)
    assert params is not None
    assert tokenizer is not None and tokenizer.encode("hello worlds")[0] == 2  # [CLS]

    ids = np.array([[2, 5, 6, 3]], np.int64)
    mask = np.ones((1, 4), bool)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask.astype(np.int64))
        ).last_hidden_state.numpy()
    ours = np.asarray(minilm_hidden_states(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_embedding_model_with_weights_path(tmp_path):
    from crs_tpu.rag.embedding import EmbeddingModel

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=384, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=64, max_position_embeddings=64,
    )
    model = transformers.BertModel(hf_cfg).eval()
    model.save_pretrained(str(tmp_path))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "alpha", "beta"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    import dataclasses

    import crs_tpu.rag.embedding as emb_mod
    from crs_tpu.models.minilm import MiniLMConfig

    em = EmbeddingModel({
        "backend": "minilm", "weights_path": str(tmp_path), "batch_size": 2,
    })
    # checkpoint has 1 layer vs MiniLM's 6 — loader should fall back cleanly
    # OR load if dims align; either way embed() must work
    out = em.embed(["alpha beta", "beta"])
    assert out.shape == (2, 384)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)
