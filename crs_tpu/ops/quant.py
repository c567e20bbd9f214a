"""Scalar (int8) vector quantization and the quantized top-k scan.

The int8 index format of the vector store (BASELINE.json config #3): corpus
vectors are stored as per-vector-scaled int8 codes (4x smaller than fp32),
the scan runs on the MXU's native int8 path (int8×int8→int32 accumulate),
and the top ``rescore_k`` candidates are re-scored against the fp32 query
using dequantized vectors — recovering the precision lost to *query*
quantization so recall matches the exact path.

Also hosts the generic tensor quantizers used for weight-only quantized
models (per-channel int8, group-wise int4) — the TPU-native equivalents of
the reference's GPTQ/AWQ/HQQ dependency kernels
(``models/{gptq,awq,hqq}_model.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "scalar_quantize",
    "scalar_dequantize",
    "int8_topk",
    "quantize_int8_rowwise",
    "quantize_int4_grouped",
    "dequantize_int4_grouped",
]

NEG_INF = jnp.float32(-1e30)


@jax.jit
def scalar_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: returns (codes int8 [N, D], scales f32 [N])."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scales = jnp.maximum(amax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


@jax.jit
def scalar_dequantize(codes: jax.Array, scales: jax.Array) -> jax.Array:
    return codes.astype(jnp.float32) * scales[:, None]


# corpora at least this many rows route the candidate scan through the
# fused Pallas kernel: the XLA path materializes [B, N] scores and
# lax.top_k over them dominates past ~1M rows (measured 10M×384, B=64:
# XLA 251 ms vs Pallas 19.5 ms per batch — tools/bench_scale.py)
_PALLAS_SCAN_MIN_ROWS = 4 * 4096


def _rescore_candidates(codes, scales, queries, cand_ok, cand_ids, k):
    """fp32 exact rescore of gathered candidates (shared by both scan paths).

    ``cand_ok`` [B, cand_k] bool marks candidates that passed the scan's
    valid/row-mask filtering (an id-based mask, NOT a score sentinel — the
    Pallas path scales emitted scores by the per-query quantization scale,
    which can shrink a -1e30 sentinel past any magnitude threshold)."""
    cand_vecs = codes[cand_ids].astype(jnp.float32) * scales[cand_ids][..., None]
    exact = jnp.einsum("bd,bcd->bc", queries, cand_vecs, preferred_element_type=jnp.float32)
    exact = jnp.where(cand_ok, exact, NEG_INF)
    top_s, sel = jax.lax.top_k(exact, min(k, exact.shape[1]))
    top_i = jnp.take_along_axis(cand_ids, sel, axis=1)
    return top_s, top_i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def _rescore_candidates_jit(codes, scales, queries, cand_ok, cand_ids, k):
    return _rescore_candidates(codes, scales, queries, cand_ok, cand_ids, k)


# past this many [B, N] score-matrix bytes the dense XLA body would not fit
# HBM next to the corpus (measured: B=256 at 10M rows planned a 13.2 GB
# program — the lax.cond fallback branch allocates even when never taken),
# so the fallback goes blockwise: O(B·block) memory, identical results
_INT8_DENSE_MAX_SCORE_BYTES = 1 << 30


@partial(jax.jit, static_argnames=("k", "block_size"))
def _int8_topk_xla_blockwise(
    codes, scales, queries, k, valid_n=None, row_mask=None,
    block_size: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Blockwise exact-int8-score top-k via ``lax.scan`` — same result as
    the dense body with rescore_k=0, O(B·block_size) peak memory."""
    n, d = codes.shape
    b = queries.shape[0]
    q_codes, q_scales = scalar_quantize(queries)
    num_blocks = -(-n // block_size)
    padded = num_blocks * block_size
    if padded != n:
        codes = jnp.pad(codes, ((0, padded - n), (0, 0)))
        scales = jnp.pad(scales, (0, padded - n))
    mask = jnp.arange(padded) < (jnp.asarray(valid_n) if valid_n is not None else n)
    if row_mask is not None:
        mask = mask & jnp.pad(row_mask, (0, padded - n)) if padded != n \
            else mask & row_mask
    blocks = codes.reshape(num_blocks, block_size, d)
    scale_blocks = scales.reshape(num_blocks, block_size)
    mask_blocks = mask.reshape(num_blocks, block_size)

    def scan_block(carry, inp):
        best_s, best_i = carry
        blk, blk_scales, blk_mask, blk_idx = inp
        acc = jax.lax.dot_general(
            q_codes, blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, bs]
        s = acc.astype(jnp.float32) * q_scales[:, None] * blk_scales[None, :]
        s = jnp.where(blk_mask[None, :], s, NEG_INF)
        ids = blk_idx * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_size), 1)
        ids = jnp.broadcast_to(ids, s.shape)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, min(k, cat_s.shape[1]))
        return (new_s, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (
        jnp.full((b, min(k, padded)), NEG_INF, jnp.float32),
        jnp.full((b, min(k, padded)), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(
        scan_block, init,
        (blocks, scale_blocks, mask_blocks, jnp.arange(num_blocks, dtype=jnp.int32)),
    )
    if top_s.shape[1] < k:
        pad = k - top_s.shape[1]
        top_s = jnp.concatenate(
            [top_s, jnp.full((b, pad), NEG_INF, jnp.float32)], axis=1)
        top_i = jnp.concatenate([top_i, jnp.full((b, pad), -1, jnp.int32)], axis=1)
    return top_s, top_i


@partial(jax.jit, static_argnames=("k", "rescore_k"))
def _int8_topk_xla(
    codes, scales, queries, k, valid_n=None, rescore_k=0, row_mask=None
) -> Tuple[jax.Array, jax.Array]:
    """The non-routing XLA body of :func:`int8_topk` (also the Pallas
    kernel's exactness-fallback target — must never route back)."""
    n = codes.shape[0]
    if rescore_k <= k and n * queries.shape[0] * 4 > _INT8_DENSE_MAX_SCORE_BYTES:
        return _int8_topk_xla_blockwise(
            codes, scales, queries, k, valid_n=valid_n, row_mask=row_mask)
    q_codes, q_scales = scalar_quantize(queries)
    acc = jax.lax.dot_general(
        q_codes,
        codes.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N] int32
    approx = acc.astype(jnp.float32) * q_scales[:, None] * scales[None, :]
    if valid_n is not None:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        approx = jnp.where(row_ids < valid_n, approx, NEG_INF)
    if row_mask is not None:
        approx = jnp.where(row_mask[None, :], approx, NEG_INF)

    if rescore_k <= k:
        s, i = jax.lax.top_k(approx, min(k, n))
        return s, i.astype(jnp.int32)

    cand_k = min(rescore_k, n)
    cand_scores, cand_ids = jax.lax.top_k(approx, cand_k)  # [B, cand_k]
    cand_ok = cand_scores > NEG_INF / 2  # unscaled sentinel: safe here
    return _rescore_candidates(codes, scales, queries, cand_ok, cand_ids, k)


def int8_topk(
    codes: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32
    queries: jax.Array,  # [B, D] f32 (L2-normalized)
    k: int,
    valid_n: jax.Array | int | None = None,
    rescore_k: int = 0,
    row_mask: jax.Array | None = None,  # [N] bool — metadata `where` filter
) -> Tuple[jax.Array, jax.Array]:
    """int8 MXU scan + optional fp32 exact rescore of top candidates.

    With ``rescore_k > k``: scan selects ``rescore_k`` candidates using the
    fully-quantized dot, then candidates are dequantized and re-scored
    against the *fp32* query; the final top-k ordering comes from the
    rescored values. ``row_mask`` filters rows WITHOUT densifying the corpus
    (the int8 codes stay int8; masking applies to the scores).

    At ≥ ``_PALLAS_SCAN_MIN_ROWS`` rows the candidate scan runs through the
    fused Pallas kernel (identical quantized-score semantics incl. the
    exactness ceiling + fallback) instead of materializing [B, N] scores —
    12.9× faster at 10M rows. All downstream callers (the fused serving
    program, masked search, the store) inherit the routing.
    """
    n = codes.shape[0]
    if n < _PALLAS_SCAN_MIN_ROWS:
        return _int8_topk_xla(
            codes, scales, queries, k, valid_n, rescore_k=rescore_k, row_mask=row_mask
        )
    from .pallas_scan import pallas_topk_int8

    valid = n if valid_n is None else valid_n
    if rescore_k <= k:
        return pallas_topk_int8(codes, scales, queries, k, valid, row_mask=row_mask)
    cand_k = min(rescore_k, n)
    _, cand_ids = pallas_topk_int8(
        codes, scales, queries, cand_k, valid, row_mask=row_mask
    )
    cand_ok = (cand_ids >= 0) & (cand_ids < jnp.asarray(valid, jnp.int32))
    cand_ids = jnp.maximum(cand_ids, 0)  # clamp -1 padding for the gather
    if row_mask is not None:
        cand_ok = cand_ok & row_mask[cand_ids]
    return _rescore_candidates_jit(codes, scales, queries, cand_ok, cand_ids, k)


# ---------------------------------------------------------------------------
# Weight-only quantization for model parameters
# ---------------------------------------------------------------------------

@jax.jit
def quantize_int8_rowwise(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel int8 for a [in, out] weight: scales along axis 0."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scales = jnp.maximum(amax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(w / scales[None, :]), -127, 127).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


@partial(jax.jit, static_argnames=("group_size",))
def quantize_int4_grouped(w: jax.Array, group_size: int = 128) -> Tuple[jax.Array, jax.Array]:
    """Group-wise symmetric int4 along the input dim of a [in, out] weight.

    Codes are stored unpacked in int8 (values in [-7, 7]); scales are
    [in/group_size, out]. (Packing two nibbles per byte is a storage-size
    optimization handled at serialization time; compute always unpacks.)
    """
    kin, kout = w.shape
    assert kin % group_size == 0, "input dim must be divisible by group_size"
    grouped = w.reshape(kin // group_size, group_size, kout)
    amax = jnp.max(jnp.abs(grouped), axis=1)  # [G, out]
    scales = jnp.maximum(amax, 1e-12) / 7.0
    codes = jnp.clip(jnp.round(grouped / scales[:, None, :]), -7, 7).astype(jnp.int8)
    return codes.reshape(kin, kout), scales.astype(jnp.float32)


@partial(jax.jit, static_argnames=("group_size",))
def dequantize_int4_grouped(codes: jax.Array, scales: jax.Array, group_size: int = 128) -> jax.Array:
    kin, kout = codes.shape
    grouped = codes.reshape(kin // group_size, group_size, kout).astype(jnp.float32)
    return (grouped * scales[:, None, :]).reshape(kin, kout)
