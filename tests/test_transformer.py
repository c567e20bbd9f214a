"""Causal LM tests: numerics vs torch Mistral, KV-cache parity, sampling,
quantized variants, ModelInterface behavior."""

import numpy as np
import pytest

from crs_tpu.models.bytes_tokenizer import ByteTokenizer
from crs_tpu.models.model_interface import create_model_interface


@pytest.fixture(scope="module")
def tiny_model():
    m = create_model_interface("jax", {"config": "tiny"})
    m.load()
    return m


# -- architecture numerics ---------------------------------------------------

def test_matches_torch_mistral():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from crs_tpu.models.hf_loader import config_from_hf
    from crs_tpu.models.transformer import forward

    hf_cfg = transformers.MistralConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 13)).astype(np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()

    # convert weights through the hf_loader mapping (state dict in memory)
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict(), dtype=jnp.float32)

    import crs_tpu.models.hf_loader as hl

    def get(name):
        key = name if name in state else "model." + name
        return jnp.asarray(state[key], jnp.float32)

    def lin(name):
        return get(name + ".weight").T

    params = {
        "embed": get("embed_tokens.weight"),
        "layers": [],
        "final_norm": {"scale": get("norm.weight")},
        "lm_head": get("lm_head.weight").T,
    }
    for i in range(cfg.num_layers):
        base = f"layers.{i}."
        params["layers"].append({
            "attn_norm": {"scale": get(base + "input_layernorm.weight")},
            "attn": {
                "q": lin(base + "self_attn.q_proj"),
                "k": lin(base + "self_attn.k_proj"),
                "v": lin(base + "self_attn.v_proj"),
                "o": lin(base + "self_attn.o_proj"),
            },
            "mlp_norm": {"scale": get(base + "post_attention_layernorm.weight")},
            "mlp": {
                "gate": lin(base + "mlp.gate_proj"),
                "up": lin(base + "mlp.up_proj"),
                "down": lin(base + "mlp.down_proj"),
            },
        })

    ours = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)


def test_prefill_decode_matches_forward():
    """Greedy decode via KV cache must match argmax of the full forward."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.models.transformer import (
        CONFIGS, decode_step, forward, init_cache, init_params, prefill,
    )

    cfg = CONFIGS["tiny"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[7, 12, 99, 3, 42]], np.int32)

    # cached path: prefill prompt then decode 4 greedy tokens
    cache = init_cache(cfg, 1, ids.shape[1] + 4)
    logits, cache = prefill(params, cfg, jnp.asarray(ids), cache)
    toks = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(3):
        lg, cache = decode_step(params, cfg, jnp.asarray([toks[-1]], jnp.int32), cache)
        toks.append(int(jnp.argmax(lg[0])))

    # uncached path: argmax over full forward, token by token
    seq = list(ids[0])
    ref = []
    for _ in range(4):
        lg = forward(params, cfg, jnp.asarray([seq], jnp.int32))
        t = int(jnp.argmax(lg[0, -1]))
        ref.append(t)
        seq.append(t)
    assert toks == ref


def test_left_padding_invariance():
    """Left-padded prompt (masked) must produce the same logits as unpadded.

    Exact in fp32 (RoPE attention is relative-position only); bf16 adds
    absolute-position rounding noise, so the property is asserted in fp32.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from crs_tpu.models.transformer import CONFIGS, forward, init_params

    cfg = dataclasses.replace(CONFIGS["tiny"], dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 6, 7, 8]], np.int32)
    plain = np.asarray(forward(params, cfg, jnp.asarray(ids)))

    padded = np.array([[0, 0, 5, 6, 7, 8]], np.int32)
    mask = np.array([[False, False, True, True, True, True]])
    padded_out = np.asarray(forward(params, cfg, jnp.asarray(padded), jnp.asarray(mask)))
    np.testing.assert_allclose(padded_out[0, 2:], plain[0], atol=1e-4, rtol=1e-4)


# -- sampling ---------------------------------------------------------------

def test_generate_greedy_deterministic(tiny_model):
    a = tiny_model.generate("hello world", max_new_tokens=8)
    b = tiny_model.generate("hello world", max_new_tokens=8)
    assert a == b


def test_generate_batch_matches_single(tiny_model):
    prompts = ["alpha", "a longer prompt with more bytes"]
    batch = tiny_model.generate_batch(prompts, max_new_tokens=6)
    singles = [tiny_model.generate(p, max_new_tokens=6) for p in prompts]
    assert batch == singles


def test_generate_sampling_controls(tiny_model):
    s1 = tiny_model.generate("abc", max_new_tokens=8, temperature=1.0, top_p=0.9, seed=1)
    s2 = tiny_model.generate("abc", max_new_tokens=8, temperature=1.0, top_p=0.9, seed=2)
    assert isinstance(s1, str) and isinstance(s2, str)
    # same seed reproduces
    assert s1 == tiny_model.generate("abc", max_new_tokens=8, temperature=1.0, top_p=0.9, seed=1)


def test_repetition_penalty_changes_output(tiny_model):
    base = tiny_model.generate("xyz", max_new_tokens=12)
    pen = tiny_model.generate("xyz", max_new_tokens=12, repetition_penalty=2.0)
    assert isinstance(pen, str)  # may or may not differ for a random model


def test_loglikelihood_ordering(tiny_model):
    """Loglikelihood is a finite negative number; longer continuation ≤ shorter."""
    short = tiny_model.get_loglikelihood("the quick", " brown")
    long = tiny_model.get_loglikelihood("the quick", " brown fox jumps")
    assert np.isfinite(short) and np.isfinite(long)
    assert short < 0 and long < short


def test_forward_shape(tiny_model):
    out = tiny_model.forward(np.array([[1, 2, 3]], np.int32))
    assert out.shape == (1, 3, 512)


# -- quantized variants -------------------------------------------------------

@pytest.mark.parametrize("qtype,min_corr", [("int8", 0.98), ("int4", 0.90)])
def test_quantized_generation_close(qtype, min_corr, tiny_model):
    # Random-init weights have zero redundancy, the worst case for
    # quantization — int4 tolerance is accordingly looser than int8.
    qm = create_model_interface(qtype, {"config": "tiny", "group_size": 32})
    qm.load()
    ids = np.array([[1, 2, 3, 4]], np.int32)
    full = tiny_model.forward(ids)
    q = qm.forward(ids)
    c = np.corrcoef(full.ravel(), q.ravel())[0, 1]
    assert c > min_corr, c
    out = qm.generate("test prompt", max_new_tokens=5)
    assert isinstance(out, str)


def test_quantized_model_info_sizes(tiny_model):
    info_full = tiny_model.get_model_info()
    q8 = create_model_interface("int8", {"config": "tiny"}); q8.load()
    q4 = create_model_interface("int4", {"config": "tiny"}); q4.load()
    s_full = info_full["model_size_gb"]
    s8 = q8.get_model_info()["model_size_gb"]
    s4 = q4.get_model_info()["model_size_gb"]
    assert s8 < s_full  # int8 < bf16
    assert s4 < s8  # packed int4 < int8
    assert info_full["num_parameters"] > 0


def test_factory_aliases():
    # gptq/awq route to the CALIBRATED quantizers (quant_calib); hqq stays
    # plain int4 RTN; nf4 is the true nonuniform codebook (round 5)
    for alias, expected in (("gptq", "gptq4"), ("awq", "awq4"),
                            ("hqq", "int4"), ("nf4", "nf4")):
        m = create_model_interface(alias, {"config": "tiny"})
        assert m.quantization == expected
    with pytest.raises(ValueError):
        create_model_interface("cuda_only_thing")


# -- byte tokenizer ----------------------------------------------------------

def test_byte_tokenizer_roundtrip():
    t = ByteTokenizer()
    text = "Hello, 世界! émojis 🎉"
    ids = t.encode(text)
    assert ids[0] == t.bos_id
    assert t.decode(ids) == text


def test_byte_tokenizer_truncation():
    t = ByteTokenizer()
    ids = t.encode("a" * 100, max_length=10)
    assert len(ids) == 10


def test_save_load_pretrained_quantized(tmp_path):
    """Prequantized model cache (reference hqq qmodel.pt parity): reload
    reproduces logits exactly without re-quantizing."""
    m = create_model_interface("int8", {"config": "tiny"})
    m.load()
    ids = np.array([[5, 6, 7]], np.int32)
    ref = m.forward(ids)
    m.save_pretrained(str(tmp_path))

    m2 = create_model_interface("jax", {"config": "tiny"})
    m2.load_pretrained(str(tmp_path))
    assert m2.quantization == "int8"
    out = m2.forward(ids)
    np.testing.assert_array_equal(ref, out)


def test_save_load_pretrained_lora(tmp_path):
    import jax

    from crs_tpu.finetuning.lora import LoRAWeight, add_lora

    m = create_model_interface("jax", {"config": "tiny"})
    m.load()
    m.params = add_lora(m.params, jax.random.PRNGKey(1), rank=2)
    lw = m.params["layers"][0]["attn"]["q"]
    m.params["layers"][0]["attn"]["q"] = LoRAWeight(lw.base, lw.lora_a, lw.lora_b + 0.05, lw.alpha, lw.rank)
    ids = np.array([[9, 2, 4]], np.int32)
    ref = m.forward(ids)
    m.save_pretrained(str(tmp_path))

    m2 = create_model_interface("jax", {"config": "tiny"})
    m2.load_pretrained(str(tmp_path))
    np.testing.assert_array_equal(ref, m2.forward(ids))


@pytest.mark.parametrize("qtype", ["int2", "int3"])
def test_extreme_lowbit_variants(qtype):
    """HQQ nbits ∈ {2,3} equivalents: run and stay finite (quality collapses
    on random weights by design)."""
    m = create_model_interface(qtype, {"config": "tiny", "group_size": 32})
    m.load()
    out = m.forward(np.array([[1, 2, 3]], np.int32))
    assert np.isfinite(out).all()
    info = m.get_model_info()
    assert info["quantization"] == qtype
    # int2 stored unpacked int8, so bytes match int8-size not smaller; the
    # capability (levels) is what's tested here
    assert isinstance(m.generate("x", max_new_tokens=3), str)


class TestProjectionFusion:
    """fuse_qkv_params must be mathematically identical to the split form."""

    def _params(self, cfg, quant=None, **kw):
        import jax

        from crs_tpu.models.transformer import init_params

        params = init_params(jax.random.PRNGKey(3), cfg)
        if quant:
            from crs_tpu.models.quantized import quantize_params

            params = quantize_params(params, bits=quant, **kw)
        return params

    def test_int8_fused_logits_exact(self):
        import jax.numpy as jnp
        import numpy as np

        from crs_tpu.models.transformer import CONFIGS, forward, fuse_qkv_params

        cfg = CONFIGS["tiny"]
        params = self._params(cfg, quant=8)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 9)))
        base = np.asarray(forward(params, cfg, ids))
        fused = np.asarray(forward(fuse_qkv_params(params), cfg, ids))
        # same activation quantizer input and per-column scales: the int32
        # dot per output column is unchanged, only XLA reduction layout may
        # differ → near-exact
        np.testing.assert_allclose(base, fused, rtol=1e-5, atol=1e-5)

    def test_bf16_fused_generate_identical_tokens(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from crs_tpu.models.sampling import SamplingParams, generate_tokens
        from crs_tpu.models.transformer import CONFIGS, fuse_qkv_params

        cfg = dataclasses.replace(CONFIGS["tiny"], dtype=jnp.float32)
        params = self._params(cfg)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 512, (2, 8)))
        mask = jnp.ones((2, 8), jnp.bool_)
        sp = SamplingParams(max_new_tokens=5, temperature=0.0, eos_id=-1)
        t1, _ = generate_tokens(params, cfg, ids, mask, jax.random.PRNGKey(0), sp)
        t2, _ = generate_tokens(
            fuse_qkv_params(params), cfg, ids, mask, jax.random.PRNGKey(0), sp
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_int4_fused_close(self):
        import jax.numpy as jnp
        import numpy as np

        from crs_tpu.models.transformer import CONFIGS, forward, fuse_qkv_params

        cfg = CONFIGS["tiny"]
        params = self._params(cfg, quant=4, group_size=64)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 512, (1, 7)))
        base = np.asarray(forward(params, cfg, ids))
        fused = np.asarray(forward(fuse_qkv_params(params), cfg, ids))
        np.testing.assert_allclose(base, fused, rtol=2e-2, atol=2e-2)

    def test_jax_model_loads_fused(self):
        from crs_tpu.models.model_interface import JaxModel

        m = JaxModel({"config": "tiny", "quantization": "int8",
                      "fuse_projections": True})
        m.load()
        assert "qkv" in m.params["layers"][0]["attn"]
        assert "gateup" in m.params["layers"][0]["mlp"]
        out = m.generate("hi", max_new_tokens=4)
        assert isinstance(out, str)

    def test_lora_params_not_fused(self):
        import jax

        from crs_tpu.finetuning.lora import add_lora
        from crs_tpu.models.transformer import CONFIGS, fuse_qkv_params, init_params

        cfg = CONFIGS["tiny"]
        params = add_lora(init_params(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
        fused = fuse_qkv_params(params)
        assert "q" in fused["layers"][0]["attn"]  # untouched
