"""ICI-sharded corpus scan: per-shard top-k + allgather merge.

The multi-chip retrieval path (BASELINE.json config #5, SURVEY.md §2c/§5):
corpus vectors are sharded row-wise across the mesh's ``corpus`` axis;
queries are replicated; each shard runs the local fused top-k scan; the
per-shard (scores, global-ids) pairs ride ICI via ``jax.lax.all_gather`` and
a replicated merge-top-k produces the global result. Empty/padded shards
contribute ``-inf`` scores and are excluded by construction (the reference's
empty-result guards: ``rag/indexing.py:147-149``, ``rag/retrieval.py:124-127``).

Works identically on a 1-device mesh (single chip) and on an
``xla_force_host_platform_device_count`` CPU mesh (CI).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

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


@partial(jax.jit, static_argnames=("k", "axis_name", "mesh"))
def _sharded_topk_impl(vectors, queries, valid_n, row_mask, k: int, mesh: Mesh, axis_name: str):
    num_shards = mesh.shape[axis_name]
    per_shard = vectors.shape[0] // num_shards

    def local_scan(v_local, q, valid, mask_local):
        # v_local: [per_shard, D]; q replicated [B, D]; mask_local [per_shard]
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
        scores = jnp.dot(
            q.astype(v_local.dtype),
            v_local.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, per_shard]
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, per_shard), 1) + offset
        scores = jnp.where((local_ids < valid) & mask_local[None, :], scores, NEG_INF)
        k_local = min(k, per_shard)
        s, i = jax.lax.top_k(scores, k_local)
        gids = jnp.take_along_axis(jnp.broadcast_to(local_ids, scores.shape), i, axis=1)
        # allgather along the corpus axis → [S, B, k_local] on every shard
        all_s = jax.lax.all_gather(s, axis_name)
        all_i = jax.lax.all_gather(gids, axis_name)
        b = q.shape[0]
        flat_s = all_s.transpose(1, 0, 2).reshape(b, -1)
        flat_i = all_i.transpose(1, 0, 2).reshape(b, -1)
        top_s, sel = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
        top_i = jnp.take_along_axis(flat_i, sel, axis=1)
        return top_s, top_i

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
) -> Tuple[jax.Array, jax.Array]:
    """Global exact top-k over the sharded corpus. Returns ([B,k], [B,k])."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((vectors.shape[0],), jnp.bool_)
    return _sharded_topk_impl(vectors, queries, valid, row_mask, k, mesh, axis_name)


@partial(jax.jit, static_argnames=("k", "rescore_k", "axis_name", "mesh"))
def _sharded_topk_int8_impl(codes, scales, queries, valid_n, row_mask, k: int, rescore_k: int, mesh: Mesh, axis_name: str):
    num_shards = mesh.shape[axis_name]
    per_shard = codes.shape[0] // num_shards

    def local_scan(c_local, s_local, q, valid, mask_local):
        # c_local [per_shard, D] int8, s_local [per_shard] f32, q [B, D] f32
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
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
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, per_shard), 1) + offset
        allowed = (local_ids < valid) & mask_local[None, :]
        approx = jnp.where(allowed, approx, NEG_INF)
        cand_k = min(rescore_k, per_shard)
        _, cand = jax.lax.top_k(approx, cand_k)  # [B, cand_k] local row idx
        # exact fp32 rescore of local candidates (dequantized)
        cand_vecs = c_local[cand].astype(jnp.float32) * s_local[cand][..., None]
        exact = jnp.einsum("bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32)
        gids = cand + offset
        exact = jnp.where((gids < valid) & mask_local[cand], exact, NEG_INF)
        k_local = min(k, cand_k)
        s_top, sel = jax.lax.top_k(exact, k_local)
        i_top = jnp.take_along_axis(gids, sel, axis=1)
        all_s = jax.lax.all_gather(s_top, axis_name)
        all_i = jax.lax.all_gather(i_top, axis_name)
        b = q.shape[0]
        flat_s = all_s.transpose(1, 0, 2).reshape(b, -1)
        flat_i = all_i.transpose(1, 0, 2).reshape(b, -1)
        top_s, sel2 = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
        return top_s, jnp.take_along_axis(flat_i, sel2, axis=1)

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
) -> Tuple[jax.Array, jax.Array]:
    """Sharded int8 scan: per-shard MXU int8 approx → local fp32 rescore →
    allgather + global merge (the compressed multi-chip retrieval path)."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((codes.shape[0],), jnp.bool_)
    return _sharded_topk_int8_impl(codes, scales, queries, valid, row_mask, k, rescore_k, mesh, axis_name)


@partial(jax.jit, static_argnames=("k", "rescore_k", "axis_name", "mesh"))
def _sharded_topk_rpq_impl(
    rotation, coarse, centroids, coarse_ids, pq_codes, i8_codes, i8_scales,
    queries, valid_n, row_mask, k: int, rescore_k: int, mesh: Mesh, axis_name: str,
):
    num_shards = mesh.shape[axis_name]
    per_shard = pq_codes.shape[0] // num_shards
    m = pq_codes.shape[1]

    def local_scan(rot, crs, cents, cid_l, pq_l, c_l, s_l, q, valid, mask_local):
        # cid_l [per], pq_l [per, M], c_l [per, D] int8, s_l [per], q [B, D]
        shard_idx = jax.lax.axis_index(axis_name)
        offset = shard_idx * per_shard
        qr = jnp.dot(q, rot, preferred_element_type=jnp.float32)
        coarse_lut = jnp.dot(qr, crs.T, preferred_element_type=jnp.float32)
        scores = coarse_lut[:, cid_l]  # [B, per]
        b, d = qr.shape
        q_sub = qr.reshape(b, m, d // m)
        lut = jnp.einsum("bmd,mkd->bmk", q_sub, cents, preferred_element_type=jnp.float32)
        for mi in range(m):
            scores = scores + lut[:, mi, :][:, pq_l[:, mi]]
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, per_shard), 1) + offset
        scores = jnp.where((local_ids < valid) & mask_local[None, :], scores, NEG_INF)
        cand_k = min(rescore_k, per_shard)
        _, cand = jax.lax.top_k(scores, cand_k)
        # exact-ish local rescore against the ORIGINAL-space int8 codes
        cand_vecs = c_l[cand].astype(jnp.float32) * s_l[cand][..., None]
        exact = jnp.einsum("bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32)
        gids = cand + offset
        exact = jnp.where((gids < valid) & mask_local[cand], exact, NEG_INF)
        k_local = min(k, cand_k)
        s_top, sel = jax.lax.top_k(exact, k_local)
        i_top = jnp.take_along_axis(gids, sel, axis=1)
        all_s = jax.lax.all_gather(s_top, axis_name)
        all_i = jax.lax.all_gather(i_top, axis_name)
        flat_s = all_s.transpose(1, 0, 2).reshape(b, -1)
        flat_i = all_i.transpose(1, 0, 2).reshape(b, -1)
        top_s, sel2 = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
        return top_s, jnp.take_along_axis(flat_i, sel2, axis=1)

    return jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(), P(), P(),
                  P(axis_name), P(axis_name, None), P(axis_name, None), P(axis_name),
                  P(), P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(rotation, coarse, centroids, coarse_ids, pq_codes, i8_codes, i8_scales,
      queries, valid_n, row_mask)


def sharded_topk_residual_pq(
    rpq,  # ResidualPQ (replicated: rotation/coarse/codebook)
    coarse_ids: jax.Array,  # [Np] int32, row-sharded
    pq_codes: jax.Array,  # [Np, M] int32, row-sharded
    i8_codes: jax.Array,  # [Np, D] int8, row-sharded (rescore)
    i8_scales: jax.Array,  # [Np] f32, row-sharded
    queries: jax.Array,
    k: int,
    valid_n: int,
    mesh: Mesh,
    rescore_k: int = 64,
    axis_name: str = "corpus",
    row_mask=None,  # [Np] bool — metadata `where` filter (None → all rows)
) -> Tuple[jax.Array, jax.Array]:
    """Sharded residual-PQ scan (VERDICT r1 #4: pq in the mesh store):
    per-shard coarse+residual ADC → local int8 rescore → allgather merge.
    Codebooks/rotation are replicated (small); only the per-row codes shard."""
    valid = jnp.asarray(valid_n, jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones((pq_codes.shape[0],), jnp.bool_)
    return _sharded_topk_rpq_impl(
        rpq.rotation, rpq.coarse, rpq.codebook.centroids,
        coarse_ids, pq_codes, i8_codes, i8_scales,
        queries, valid, row_mask, k, rescore_k, mesh, axis_name,
    )
