"""Exact top-k similarity scan primitives (XLA path).

The TPU-native replacement for the reference's ChromaDB/hnswlib ANN search
(``rag/indexing.py:125-180``): corpus vectors are HBM-resident arrays and
top-k is a brute-force cosine scan — one large MXU matmul + on-chip top-k —
which at corpus scales up to tens of millions of vectors is both faster and
*exact* (recall 1.0 vs the reference's approximate HNSW).

These are the jit-compiled XLA reference implementations; the fused Pallas
kernels in ``crs_tpu.ops.pallas_scan`` implement the same contract for large
corpora (blockwise scan without materializing the full [B, N] score matrix).

All functions assume L2-normalized vectors so cosine == dot product.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["exact_topk", "blockwise_topk", "merge_topk"]

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("k",))
def exact_topk(
    vectors: jax.Array,  # [N, D] (fp32 or bf16), rows >= valid_n are padding
    queries: jax.Array,  # [B, D] fp32
    k: int,
    valid_n: jax.Array | int | None = None,
    row_mask: jax.Array | None = None,  # [N] bool — metadata `where` filter
) -> Tuple[jax.Array, jax.Array]:
    """Exact cosine top-k: returns (scores [B, k] f32, ids [B, k] i32)."""
    n = vectors.shape[0]
    # HIGHEST precision: the exact path is the recall oracle — fp32-true
    # accumulation (bf16 inputs still use their storage dtype).
    scores = jnp.dot(
        queries.astype(vectors.dtype),
        vectors.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if valid_n is not None:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(row_ids < valid_n, scores, NEG_INF)
    if row_mask is not None:
        scores = jnp.where(row_mask[None, :], scores, NEG_INF)
    k_eff = min(k, n)
    top_scores, top_ids = jax.lax.top_k(scores, k_eff)
    if k_eff < k:  # pad to requested k with -inf/-1
        pad_s = jnp.full((scores.shape[0], k - k_eff), NEG_INF, jnp.float32)
        pad_i = jnp.full((scores.shape[0], k - k_eff), -1, jnp.int32)
        top_scores = jnp.concatenate([top_scores, pad_s], axis=1)
        top_ids = jnp.concatenate([top_ids, pad_i], axis=1)
    return top_scores, top_ids.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "block_size"))
def blockwise_topk(
    vectors: jax.Array,
    queries: jax.Array,
    k: int,
    valid_n: jax.Array | int,
    block_size: int = 4096,
    row_mask: jax.Array | None = None,  # [N] bool — metadata `where` filter
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k scanning the corpus in blocks via ``lax.scan``.

    Never materializes the [B, N] score matrix — peak memory is
    O(B·block_size) — and keeps each matmul MXU-sized. Functionally identical
    to :func:`exact_topk`.
    """
    n, d = vectors.shape
    b = queries.shape[0]
    num_blocks = -(-n // block_size)
    padded = num_blocks * block_size
    if padded != n:
        vectors = jnp.pad(vectors, ((0, padded - n), (0, 0)))
    blocks = vectors.reshape(num_blocks, block_size, d)
    mask_blocks = None
    if row_mask is not None:
        if padded != n:
            row_mask = jnp.pad(row_mask, (0, padded - n))
        mask_blocks = row_mask.reshape(num_blocks, block_size)
    q = queries.astype(vectors.dtype)

    def scan_block(carry, inp):
        best_s, best_i = carry
        block, blk_mask, blk_idx = inp
        s = jnp.dot(
            q, block.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, bs]
        ids = blk_idx * block_size + jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
        s = jnp.where(ids < valid_n, s, NEG_INF)
        if blk_mask is not None:
            s = jnp.where(blk_mask[None, :], s, NEG_INF)
        ids = jnp.broadcast_to(ids, s.shape)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    blk_idx = jnp.arange(num_blocks, dtype=jnp.int32)
    if mask_blocks is None:
        (scores, ids), _ = jax.lax.scan(
            lambda c, inp: scan_block(c, (inp[0], None, inp[1])),
            init, (blocks, blk_idx),
        )
    else:
        (scores, ids), _ = jax.lax.scan(
            scan_block, init, (blocks, mask_blocks, blk_idx)
        )
    return scores, ids


@partial(jax.jit, static_argnames=("k",))
def merge_topk(
    scores: jax.Array,  # [B, S, k] per-shard scores
    ids: jax.Array,  # [B, S, k] per-shard GLOBAL ids
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k lists into a global top-k (allgather merge step)."""
    b = scores.shape[0]
    flat_s = scores.reshape(b, -1)
    flat_i = ids.reshape(b, -1)
    top_s, sel = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
    top_i = jnp.take_along_axis(flat_i, sel, axis=1)
    return top_s, top_i
