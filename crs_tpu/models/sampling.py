"""Autoregressive generation: prefill + jitted decode loop with sampling.

The TPU decode loop replacing the reference's ``model.generate`` calls
(``models/huggingface_model.py:128-138``), with the sampling controls the
RAG generator uses (``rag/generation.py:66-73``): greedy, temperature,
top-p, top-k, and repetition penalty, plus EOS early-stop masking.

The whole decode runs as one ``lax.scan`` over ``max_new_tokens`` — no
Python-loop dispatch per token — with static shapes (prompt bucketing is the
caller's job, see :class:`crs_tpu.models.model_interface.JaxModel`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .transformer import TransformerConfig, decode_step, init_cache, prefill

__all__ = ["SamplingParams", "generate_tokens"]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 → greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 → disabled
    repetition_penalty: float = 1.0
    eos_id: int = -1  # -1 → never stops early
    pad_id: int = 0


def _apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: float) -> jax.Array:
    """HF convention: seen tokens' logits divided (if >0) / multiplied (if <0)."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -1e30, logits)


def _top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest set whose cumulative prob ≥ top_p (include crosser)
    keep = cum - probs < top_p
    # Cutoff is the SMALLEST kept logit: everything at or above it survives.
    # (max of kept logits would always equal the global max — greedy collapse.)
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, -1e30, logits)


def _sample(logits: jax.Array, key: jax.Array, sp: SamplingParams) -> jax.Array:
    if sp.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / sp.temperature
    logits = _top_k_filter(logits, sp.top_k)
    logits = _top_p_filter(logits, sp.top_p)
    return jax.random.categorical(key, logits, axis=-1)


@partial(jax.jit, static_argnames=("cfg", "sp", "mesh"))
def generate_tokens(
    params,
    cfg: TransformerConfig,
    prompt_ids: jax.Array,  # [B, S] left-padded
    prompt_mask: jax.Array,  # [B, S] bool
    key: jax.Array,
    sp: SamplingParams,
    mesh=None,  # dp×tp Mesh: int8-KV kernel partitioning (sharded serving)
) -> Tuple[jax.Array, jax.Array]:
    """Generate. Returns (tokens [B, max_new_tokens], lengths [B]).

    Tokens after a row's EOS are ``pad_id``; ``lengths`` counts real tokens
    (including the EOS itself).
    """
    b, s = prompt_ids.shape
    cache = init_cache(cfg, b, s + sp.max_new_tokens)
    logits, cache = prefill(params, cfg, prompt_ids, cache, prompt_mask)
    last_logits = logits[:, -1, :]

    # token-presence mask for repetition penalty (prompt tokens count)
    vocab = cfg.vocab_size
    seen0 = jnp.zeros((b, vocab), jnp.bool_)
    seen0 = seen0.at[jnp.arange(b)[:, None], prompt_ids].set(True)

    def step(carry, step_key):
        cache, logits, seen, done = carry
        if sp.repetition_penalty != 1.0:
            logits = _apply_repetition_penalty(logits, seen, sp.repetition_penalty)
        token = _sample(logits, step_key, sp)
        token = jnp.where(done, jnp.int32(sp.pad_id), token.astype(jnp.int32))
        new_done = done | (token == sp.eos_id)
        seen = seen.at[jnp.arange(b), token].set(True)
        next_logits, cache = decode_step(params, cfg, token, cache, mesh=mesh)
        return (cache, next_logits, seen, new_done), (token, done)

    keys = jax.random.split(key, sp.max_new_tokens)
    done0 = jnp.zeros((b,), jnp.bool_)
    (_, _, _, _), (tokens, was_active) = jax.lax.scan(
        step, (cache, last_logits, seen0, done0), keys
    )
    tokens = tokens.T  # [B, T]
    active = ~was_active.T  # step emitted a real token (row not yet done)
    lengths = jnp.sum(active, axis=1)
    return tokens, lengths
