"""Convert local HuggingFace Llama/Mistral checkpoints to our params pytree.

Gated on a local checkpoint directory existing (zero-egress images have
none; the loader never touches the network). Mirrors the reference's load
path (``models/huggingface_model.py:20-91``) minus the hub download.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .transformer import TransformerConfig

logger = logging.getLogger(__name__)

__all__ = ["load_hf_causal_lm", "config_from_hf"]


def config_from_hf(config: Dict[str, Any], dtype=jnp.bfloat16) -> TransformerConfig:
    return TransformerConfig(
        vocab_size=config["vocab_size"],
        hidden_size=config["hidden_size"],
        num_layers=config["num_hidden_layers"],
        num_heads=config["num_attention_heads"],
        num_kv_heads=config.get("num_key_value_heads", config["num_attention_heads"]),
        intermediate_size=config["intermediate_size"],
        max_seq_len=min(config.get("max_position_embeddings", 4096), 8192),
        rope_theta=float(config.get("rope_theta", 10000.0)),
        rms_eps=float(config.get("rms_norm_eps", 1e-5)),
        tie_embeddings=bool(config.get("tie_word_embeddings", False)),
        dtype=dtype,
    )


def _load_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load tensors from safetensors shard(s) or a torch .bin, as numpy."""
    try:
        shards = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors") and not f.startswith(".")
        )
        if shards:
            # Real Llama/Mistral checkpoints are bf16, which
            # safetensors.numpy cannot decode — go through the torch
            # framework (upcast bf16→fp32; we re-cast to the target
            # dtype when building the pytree).
            state: Dict[str, np.ndarray] = {}
            try:
                from safetensors.torch import load_file as load_pt  # type: ignore

                for s in shards:
                    sd = load_pt(os.path.join(path, s))
                    state.update({k: v.float().numpy() for k, v in sd.items()})
                return state
            except ImportError:  # torch-less image: numpy framework (fp16/fp32 only)
                from safetensors.numpy import load_file  # type: ignore

                for s in shards:
                    state.update(load_file(os.path.join(path, s)))
                return state
        bins = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
        if bins:
            import torch  # type: ignore

            state = {}
            for bpath in bins:
                sd = torch.load(os.path.join(path, bpath), map_location="cpu", weights_only=True)
                state.update({k: v.float().numpy() for k, v in sd.items()})
            return state
    except Exception as e:  # pragma: no cover - environment dependent
        logger.warning("failed to load checkpoint from %s: %s", path, e)
    return None


def load_hf_causal_lm(path: str, dtype=jnp.bfloat16) -> Optional[Tuple[TransformerConfig, Dict[str, Any]]]:
    """Load (config, params) from a local HF Llama/Mistral checkpoint dir."""
    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, dtype)
    state = _load_state_dict(path)
    if state is None:
        return None

    def get(name: str) -> jnp.ndarray:
        key = name if name in state else "model." + name
        return jnp.asarray(np.asarray(state[key]), dtype)

    def lin(name: str) -> jnp.ndarray:  # torch [out, in] → jax [in, out]
        return get(name + ".weight").T

    params: Dict[str, Any] = {
        "embed": get("embed_tokens.weight"),
        "layers": [],
        "final_norm": {"scale": get("norm.weight")},
    }
    for i in range(cfg.num_layers):
        base = f"layers.{i}."
        params["layers"].append(
            {
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
            }
        )
    if not cfg.tie_embeddings:
        key = "lm_head.weight"
        params["lm_head"] = jnp.asarray(np.asarray(state[key]), dtype).T
    logger.info("Loaded HF checkpoint from %s (%d layers)", path, cfg.num_layers)
    return cfg, params
