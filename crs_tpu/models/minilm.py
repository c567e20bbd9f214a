"""MiniLM (6-layer BERT) sentence encoder as a pure-JAX jitted forward.

TPU-native replacement for the reference's sentence-transformers MiniLM
(``rag/embedding.py:27-73``): all-MiniLM-L6-v2 architecture — 6 post-LN
transformer layers, hidden 384, 12 heads, FFN 1536, GELU, learned positions —
with masked mean pooling and L2 normalization, compiled once per
(batch, seq) bucket.

Params are a nested-dict pytree, so the encoder composes directly with
``jax.sharding`` for data-parallel embedding and with the quantization
utilities in ``crs_tpu.ops.quant``. Pretrained HF weights are converted via
``load_hf_bert_params`` when a checkpoint directory is available (zero-egress
images fall back to deterministic random init — architecture and kernels are
identical either way).
"""

from __future__ import annotations

import dataclasses
import logging
import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["MiniLMConfig", "MiniLMEncoder", "init_minilm_params", "minilm_encode", "load_hf_bert_params"]

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def init_minilm_params(key, cfg: MiniLMConfig) -> Params:
    """Deterministic truncated-normal init (std 0.02, BERT convention).

    Host-side numpy generation: per-matrix jax.random calls would each be a
    separate remote compile on the axon tunnel.
    """
    if isinstance(key, int):
        seed = key
    else:
        try:
            seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        except TypeError:
            seed = int(np.asarray(key).ravel()[-1])
    rng = np.random.default_rng(seed)

    def trunc(shape) -> np.ndarray:
        w = rng.standard_normal(shape).astype(np.float32)
        return np.clip(w, -2.0, 2.0) * 0.02

    def dense(kin: int, kout: int) -> Params:
        return {
            "kernel": jnp.asarray(trunc((kin, kout)), cfg.dtype),
            "bias": jnp.zeros((kout,), cfg.dtype),
        }

    def ln() -> Params:
        return {"scale": jnp.ones((cfg.hidden_size,), cfg.dtype), "bias": jnp.zeros((cfg.hidden_size,), cfg.dtype)}

    h, ffn = cfg.hidden_size, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": jnp.asarray(trunc((cfg.vocab_size, h)), cfg.dtype),
            "position": jnp.asarray(trunc((cfg.max_position_embeddings, h)), cfg.dtype),
            "token_type": jnp.asarray(trunc((cfg.type_vocab_size, h)), cfg.dtype),
            "ln": ln(),
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "attn": {"q": dense(h, h), "k": dense(h, h), "v": dense(h, h), "out": dense(h, h), "ln": ln()},
                "ffn": {"up": dense(h, ffn), "down": dense(ffn, h), "ln": ln()},
            }
        )
    return params


def _layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x: jax.Array, p: Params) -> jax.Array:
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32).astype(x.dtype) + p["bias"]


def _attention(x: jax.Array, p: Params, mask: jax.Array, cfg: MiniLMConfig) -> jax.Array:
    b, s, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    def split(t: jax.Array) -> jax.Array:
        return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)  # [B,H,S,hd]

    q, k, v = split(_dense(x, p["q"])), split(_dense(x, p["k"])), split(_dense(x, p["v"]))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(scores.dtype)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, h)
    return _dense(ctx, p["out"])


def minilm_hidden_states(params: Params, cfg: MiniLMConfig, ids: jax.Array, mask: jax.Array) -> jax.Array:
    """Token-level hidden states [B, S, H] (post-LN BERT stack)."""
    emb = params["embeddings"]
    s = ids.shape[1]
    x = emb["word"][ids] + emb["position"][:s][None, :, :] + emb["token_type"][0][None, None, :]
    x = _layer_norm(x, emb["ln"], cfg.layer_norm_eps)
    for layer in params["layers"]:
        a = _attention(x, layer["attn"], mask, cfg)
        x = _layer_norm(x + a, layer["attn"]["ln"], cfg.layer_norm_eps)
        f = _dense(jax.nn.gelu(_dense(x, layer["ffn"]["up"]), approximate=False), layer["ffn"]["down"])
        x = _layer_norm(x + f, layer["ffn"]["ln"], cfg.layer_norm_eps)
    return x


def minilm_encode(params: Params, cfg: MiniLMConfig, ids: jax.Array, mask: jax.Array) -> jax.Array:
    """Sentence embeddings: masked mean pool + L2 normalize → [B, H] fp32."""
    x = minilm_hidden_states(params, cfg, ids, mask)
    m = mask[:, :, None].astype(x.dtype)
    pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    pooled = pooled.astype(jnp.float32)
    return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# HF weight conversion (gated: only used when a local checkpoint exists)
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = [
    ("attention.self.query", ("attn", "q")),
    ("attention.self.key", ("attn", "k")),
    ("attention.self.value", ("attn", "v")),
    ("attention.output.dense", ("attn", "out")),
    ("intermediate.dense", ("ffn", "up")),
    ("output.dense", ("ffn", "down")),
]


def load_hf_bert_params(state_dict: Dict[str, "np.ndarray"], cfg: MiniLMConfig) -> Params:
    """Convert a HuggingFace BERT state dict (numpy arrays) to our pytree.

    Accepts keys with or without the leading ``bert.`` prefix. Dense kernels
    are transposed from torch's [out, in] to JAX's [in, out].
    """

    def get(name: str) -> jnp.ndarray:
        for prefix in ("", "bert.", "0.auto_model."):
            if prefix + name in state_dict:
                return jnp.asarray(np.asarray(state_dict[prefix + name]), cfg.dtype)
        raise KeyError(name)

    def dense(name: str) -> Params:
        return {"kernel": get(name + ".weight").T, "bias": get(name + ".bias")}

    def ln(name: str) -> Params:
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    params: Params = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}."
        layer: Params = {"attn": {}, "ffn": {}}
        for hf_name, (grp, ours) in _HF_LAYER_MAP:
            layer[grp][ours] = dense(base + hf_name)
        layer["attn"]["ln"] = ln(base + "attention.output.LayerNorm")
        layer["ffn"]["ln"] = ln(base + "output.LayerNorm")
        params["layers"].append(layer)
    return params


class MiniLMEncoder:
    """Stateful shell around the pure encode function: jit cache per bucket."""

    def __init__(self, cfg: Optional[MiniLMConfig] = None, params: Optional[Params] = None, seed: int = 0):
        self.cfg = cfg or MiniLMConfig()
        if params is None:
            params = init_minilm_params(jax.random.PRNGKey(seed), self.cfg)
            logger.info("MiniLMEncoder: deterministic random init (seed=%d)", seed)
        self.params = params
        self._encode = jax.jit(partial(minilm_encode, cfg=self.cfg))

    def encode_ids(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        return self._encode(self.params, ids=jnp.asarray(ids), mask=jnp.asarray(mask))

    @property
    def dim(self) -> int:
        return self.cfg.hidden_size
