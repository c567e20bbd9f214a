"""Maximal Marginal Relevance (MMR) diversity selection, on device.

Parity with the reference's ``_apply_diversity`` (``rag/retrieval.py:219-277``)
— greedy selection maximizing ``λ·relevance − (1−λ)·max_sim_to_selected`` —
but vectorized: the candidate-candidate similarity matrix is one MXU matmul
over embeddings the index already holds (the reference re-embeds candidate
texts per query, a second encoder forward; SURVEY.md §3.2 hot-loop note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["mmr_select"]

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("k",))
def mmr_select(
    cand_embeddings: jax.Array,  # [C, D] L2-normalized candidate embeddings
    relevance: jax.Array,  # [C] query-candidate similarity
    k: int,
    lambda_: jax.Array | float = 0.9,
) -> jax.Array:
    """Greedy MMR: returns indices [k] into the candidate list (int32).

    Invalid candidates (relevance <= NEG_INF/2) are never selected; if fewer
    than k valid candidates exist, trailing slots repeat the best candidate
    (callers dedupe by construction since selection masks chosen items).
    """
    c = cand_embeddings.shape[0]
    sim = jnp.dot(
        cand_embeddings, cand_embeddings.T, preferred_element_type=jnp.float32
    )  # [C, C]

    def step(carry, _):
        selected_mask, max_sim_to_sel, prev = carry
        # first pick: pure relevance (max_sim starts at 0 and λ-term dominates)
        score = lambda_ * relevance - (1.0 - lambda_) * max_sim_to_sel
        score = jnp.where(selected_mask, NEG_INF, score)
        idx = jnp.argmax(score)
        new_mask = selected_mask.at[idx].set(True)
        new_max = jnp.maximum(max_sim_to_sel, sim[idx])
        return (new_mask, new_max, idx), idx

    init = (jnp.zeros((c,), bool), jnp.zeros((c,), jnp.float32), jnp.int32(0))
    _, picks = jax.lax.scan(step, init, None, length=min(k, c))
    return picks.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def mmr_select_batch(
    cand_embeddings: jax.Array,  # [B, C, D] per-query candidate embeddings
    relevance: jax.Array,  # [B, C] (invalid candidates = NEG_INF)
    k: int,
    lambda_: jax.Array | float = 0.9,
) -> jax.Array:
    """Batched MMR: one device call for a whole query batch → picks [B, k].

    This is the serving-path variant — per-query MMR dispatches would pay one
    host↔device round trip each (the dominant cost observed on the axon
    tunnel); vmapping folds the whole batch into a single XLA program.
    """
    return jax.vmap(lambda e, r: mmr_select(e, r, k, lambda_))(
        cand_embeddings, relevance
    )
