"""ICI-sharded corpus scan: per-shard fused top-k + allgather merge.

The multi-chip retrieval path (BASELINE.json config #5, SURVEY.md §2c/§5):
corpus vectors are sharded row-wise across the mesh's ``corpus`` axis;
queries are replicated; each shard runs the local fused top-k scan; the
per-shard (scores, global-ids) pairs ride ICI via ``jax.lax.all_gather`` and
a replicated merge-top-k produces the global result. Empty/padded shards
contribute ``-inf`` scores and are excluded by construction (the reference's
empty-result guards: ``rag/indexing.py:147-149``, ``rag/retrieval.py:124-127``).

Round 3 (VERDICT r2 #1): the per-shard scan bodies route through the SAME
Pallas kernels as the single-chip store (``ops.pallas_scan``) once a shard
holds ≥ 4·block_size rows — multi-chip retrieval inherits the 10× kernel
wins instead of re-deriving plain XLA dense forms, and the residual-PQ body
no longer builds the per-subspace dense gather temps that compile-OOMed at
10M rows single-device (the kernel / blockwise-scan forms are O(B·block)).
On CPU meshes (CI) the kernels run in Pallas interpret mode, so the exact
same routing is what the parity tests exercise.

Works identically on a 1-device mesh (single chip) and on an
``xla_force_host_platform_device_count`` CPU mesh (CI).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import NEG_INF

__all__ = ["shard_corpus", "sharded_topk", "sharded_topk_int8", "sharded_topk_residual_pq"]


def shard_corpus(
    vectors: np.ndarray, mesh: Mesh, axis_name: str = "corpus"
) -> Tuple[jax.Array, int]:
    """Pad rows to a multiple of mesh size and shard across devices.

    Returns (sharded array [Np, D], valid_n). Row padding is zeros, which the
    scan masks out via ``valid_n``.
    """
    n = vectors.shape[0]
    num = mesh.devices.size
    per = -(-n // num)
    padded = per * num
    if padded != n:
        vectors = np.concatenate(
            [vectors, np.zeros((padded - n,) + vectors.shape[1:], vectors.dtype)]
        )
    arr = jax.device_put(
        vectors, NamedSharding(mesh, P(axis_name, *([None] * (vectors.ndim - 1))))
    )
    return arr, n


def _use_kernel(per_shard: int, block_size: int) -> bool:
    """Static routing: the fused Pallas scan pays off once a shard holds a
    few blocks (same ≥4·block_size threshold as the single-chip store)."""
    return per_shard >= 4 * block_size


def _merge_topk(s_top, i_top, k: int, axis_name: str):
    """allgather the per-shard winners along the corpus axis and reduce to
    the global top-k (replicated on every shard)."""
    all_s = jax.lax.all_gather(s_top, axis_name)  # [S, B, k_local]
    all_i = jax.lax.all_gather(i_top, axis_name)
    b = s_top.shape[0]
    flat_s = all_s.transpose(1, 0, 2).reshape(b, -1)
    flat_i = all_i.transpose(1, 0, 2).reshape(b, -1)
    top_s, sel = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
    return top_s, jnp.take_along_axis(flat_i, sel, axis=1)


@partial(jax.jit, static_argnames=("k", "axis_name", "mesh", "block_size"))
def _sharded_topk_impl(
    vectors, queries, valid_n, row_mask, k: int, mesh: Mesh, axis_name: str,
    block_size: int,
):
    num_shards = mesh.shape[axis_name]
    per_shard = vectors.shape[0] // num_shards
    k_local = min(k, per_shard)

    def local_scan(v_local, q, valid, mask_local):
        # v_local: [per_shard, D]; q replicated [B, D]; mask_local [per_shard]
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
        valid_local = jnp.clip(valid - offset, 0, per_shard)
        if _use_kernel(per_shard, block_size):
            from ..ops.pallas_scan import pallas_topk

            s, i_local = pallas_topk(
                v_local, q.astype(v_local.dtype), k_local, valid_local,
                block_size, row_mask=mask_local,
            )
            gids = i_local + offset
            return _merge_topk(s, gids, k, axis_name)
        scores = jnp.dot(
            q.astype(v_local.dtype),
            v_local.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, per_shard]
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, per_shard), 1) + offset
        scores = jnp.where((local_ids < valid) & mask_local[None, :], scores, NEG_INF)
        s, i = jax.lax.top_k(scores, k_local)
        gids = jnp.take_along_axis(jnp.broadcast_to(local_ids, scores.shape), i, axis=1)
        return _merge_topk(s, gids, k, axis_name)

    return jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(vectors, queries, valid_n, row_mask)


def sharded_topk(
    vectors: jax.Array,  # [Np, D] sharded on rows (from shard_corpus)
    queries: jax.Array,  # [B, D] replicated
    k: int,
    valid_n: int,
    mesh: Mesh,
    axis_name: str = "corpus",
    row_mask=None,  # [Np] bool — metadata `where` filter (None → all rows)
    block_size: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Global exact top-k over the sharded corpus. Returns ([B,k], [B,k])."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((vectors.shape[0],), jnp.bool_)
    return _sharded_topk_impl(
        vectors, queries, valid, row_mask, k, mesh, axis_name, block_size
    )


@partial(jax.jit, static_argnames=("k", "rescore_k", "axis_name", "mesh", "block_size"))
def _sharded_topk_int8_impl(
    codes, scales, queries, valid_n, row_mask, k: int, rescore_k: int,
    mesh: Mesh, axis_name: str, block_size: int,
):
    num_shards = mesh.shape[axis_name]
    per_shard = codes.shape[0] // num_shards

    def local_scan(c_local, s_local, q, valid, mask_local):
        # c_local [per_shard, D] int8, s_local [per_shard] f32, q [B, D] f32
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
        valid_local = jnp.clip(valid - offset, 0, per_shard)
        cand_k = min(rescore_k, per_shard)
        if _use_kernel(per_shard, block_size):
            from ..ops.pallas_scan import pallas_topk_int8

            _, cand = pallas_topk_int8(
                c_local, s_local, q, cand_k, valid_local, block_size,
                row_mask=mask_local,
            )  # [B, cand_k] local rows
        else:
            # approximate int8 scan on the MXU
            amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
            qs = jnp.maximum(amax, 1e-12) / 127.0
            qq = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qq, c_local.T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            approx = acc.astype(jnp.float32) * qs * s_local[None, :]
            local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, per_shard), 1)
            allowed = (local_ids < valid_local) & mask_local[None, :]
            approx = jnp.where(allowed, approx, NEG_INF)
            _, cand = jax.lax.top_k(approx, cand_k)  # [B, cand_k] local row idx
        # exact fp32 rescore of local candidates (dequantized)
        cand_vecs = c_local[cand].astype(jnp.float32) * s_local[cand][..., None]
        exact = jnp.einsum("bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32)
        exact = jnp.where((cand < valid_local) & mask_local[cand], exact, NEG_INF)
        k_local = min(k, cand_k)
        s_top, sel = jax.lax.top_k(exact, k_local)
        i_top = jnp.take_along_axis(cand + offset, sel, axis=1)
        return _merge_topk(s_top, i_top, k, axis_name)

    return jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(), P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(codes, scales, queries, valid_n, row_mask)


def sharded_topk_int8(
    codes: jax.Array,  # [Np, D] int8, row-sharded
    scales: jax.Array,  # [Np] f32, row-sharded
    queries: jax.Array,
    k: int,
    valid_n: int,
    mesh: Mesh,
    rescore_k: int = 64,
    axis_name: str = "corpus",
    row_mask=None,  # [Np] bool — metadata `where` filter (None → all rows)
    block_size: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Sharded int8 scan: per-shard fused int8 kernel (or MXU dense form on
    small shards) → local fp32 rescore → allgather + global merge (the
    compressed multi-chip retrieval path)."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((codes.shape[0],), jnp.bool_)
    return _sharded_topk_int8_impl(
        codes, scales, queries, valid, row_mask, k, rescore_k, mesh, axis_name,
        block_size,
    )


@partial(jax.jit, static_argnames=("k", "rescore_k", "axis_name", "mesh", "block_size"))
def _sharded_topk_rpq_impl(
    rotation, coarse, centroids, codes_ext, i8_codes, i8_scales,
    queries, valid_n, row_mask, k: int, rescore_k: int, mesh: Mesh,
    axis_name: str, block_size: int,
):
    num_shards = mesh.shape[axis_name]
    per_shard = codes_ext.shape[0] // num_shards
    num_coarse = coarse.shape[0]
    has_mirror = i8_codes is not None
    kernel_ok = (
        _use_kernel(per_shard, block_size)
        and num_coarse % 256 == 0
        and num_coarse <= 65536
    )

    def local_scan(rot, crs, cents, ext_l, q, valid, mask_local, *mirror):
        # ext_l [per, M+2] uint8 (coarse hi/lo + residual codes), q [B, D]
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
        valid_local = jnp.clip(valid - offset, 0, per_shard)
        cand_k = min(rescore_k, per_shard)
        if kernel_ok:
            from ..ops.pallas_scan import pallas_topk_residual_pq_adc

            adc_s, cand = pallas_topk_residual_pq_adc(
                rot, crs, cents, ext_l, q, cand_k, valid_local, block_size,
                row_mask=mask_local,
            )
        else:
            # blockwise XLA ADC (ops.pq._blockwise_adc_topk): O(B·block)
            # temps — the dense per-subspace gather form this replaces
            # planned 57 GB of unfused [B, N] temps at 10M rows (VERDICT
            # r2 #1 / STATUS round-2 compile-OOM lesson)
            from ..ops.pq import PQCodebook, ResidualPQ, residual_pq_adc_topk

            cid_l = ext_l[:, 0].astype(jnp.int32) * 256 + ext_l[:, 1].astype(jnp.int32)
            rpq_l = ResidualPQ(rotation=rot, coarse=crs, codebook=PQCodebook(cents))
            adc_s, cand = residual_pq_adc_topk(
                rpq_l, cid_l, ext_l[:, 2:], q, cand_k, valid_local,
                row_mask=mask_local,
            )
        if has_mirror:
            c_l, s_l = mirror
            # exact-ish local rescore against the ORIGINAL-space int8 codes
            cand_vecs = c_l[cand].astype(jnp.float32) * s_l[cand][..., None]
            exact = jnp.einsum(
                "bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32
            )
        else:
            exact = adc_s  # PQ-only serving: rank by ADC scores directly
        exact = jnp.where((cand < valid_local) & mask_local[cand], exact, NEG_INF)
        k_local = min(k, cand_k)
        s_top, sel = jax.lax.top_k(exact, k_local)
        i_top = jnp.take_along_axis(cand + offset, sel, axis=1)
        return _merge_topk(s_top, i_top, k, axis_name)

    in_specs = [P(), P(), P(), P(axis_name, None), P(), P(), P(axis_name)]
    args = [rotation, coarse, centroids, codes_ext, queries, valid_n, row_mask]
    if has_mirror:
        in_specs += [P(axis_name, None), P(axis_name)]
        args += [i8_codes, i8_scales]
    return jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)


def sharded_topk_residual_pq(
    rpq,  # ResidualPQ (replicated: rotation/coarse/codebook)
    codes_ext: jax.Array,  # [Np, M+2] uint8, row-sharded (ops.pq.residual_codes_ext)
    i8_codes: Optional[jax.Array],  # [Np, D] int8, row-sharded (rescore mirror) or None
    i8_scales: Optional[jax.Array],  # [Np] f32, row-sharded, or None
    queries: jax.Array,
    k: int,
    valid_n: int,
    mesh: Mesh,
    rescore_k: int = 64,
    axis_name: str = "corpus",
    row_mask=None,  # [Np] bool — metadata `where` filter (None → all rows)
    block_size: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """Sharded residual-PQ scan (VERDICT r1 #4 / r2 #1): per-shard fused
    coarse+residual ADC kernel (blockwise XLA form on small shards) → local
    rescore → allgather merge. Codebooks/rotation are replicated (small);
    only the per-row codes shard. ``i8_codes=None`` = PQ-only serving: no
    int8 mirror in HBM, candidates ranked by their (exact-w.r.t.-codes) ADC
    scores — M+2 bytes/vector total."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((codes_ext.shape[0],), jnp.bool_)
    return _sharded_topk_rpq_impl(
        rpq.rotation, rpq.coarse, rpq.codebook.centroids,
        codes_ext, i8_codes, i8_scales,
        queries, valid, row_mask, k, rescore_k, mesh, axis_name, block_size,
    )
