"""Product quantization: on-device k-means codebooks + ADC top-k scan.

BASELINE.json config #4: the PQ-compressed index format. The vector dim is
split into M subspaces; each subspace gets a K-entry codebook trained by
Lloyd's k-means as a jitted ``lax.scan`` (the "batched k-means codebook
training on device" capability from SURVEY.md §2b); vectors are encoded as
[N, M] uint8 code ids (D·4 → M bytes compression); queries score candidates
via asymmetric distance computation (ADC): a per-query [M, K] lookup table of
subspace dot products, summed by code-id gather. Top candidates are exactly
rescored by the caller (see ``crs_tpu.rag.index``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["PQCodebook", "train_pq", "pq_encode", "pq_adc_topk", "kmeans"]

NEG_INF = jnp.float32(-1e30)


class PQCodebook(NamedTuple):
    centroids: jax.Array  # [M, K, Dsub] f32


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(
    key: jax.Array,
    points: jax.Array,  # [N, D] f32
    num_clusters: int,
    num_iters: int = 25,
) -> jax.Array:
    """Lloyd's k-means on device; returns centroids [num_clusters, D].

    Farthest-point init (deterministic given the key's first pick) avoids the
    empty-cluster collapse of plain random init; fixed iteration count as a
    ``lax.scan`` so the whole training loop is one compiled program. Empty
    clusters keep their previous centroid.
    """
    n, d = points.shape
    first = jax.random.randint(key, (), 0, n)

    def init_step(carry, _):
        centroids, min_d2 = carry
        # pick the point farthest from all chosen centroids
        idx = jnp.argmax(min_d2)
        c = points[idx]
        d2 = jnp.sum((points - c[None, :]) ** 2, axis=1)
        new_min = jnp.minimum(min_d2, d2)
        return (centroids, new_min), c

    c0 = points[first]
    d2_0 = jnp.sum((points - c0[None, :]) ** 2, axis=1)
    (_, _), rest = jax.lax.scan(
        init_step, (c0, d2_0), None, length=num_clusters - 1
    )
    init = jnp.concatenate([c0[None, :], rest], axis=0)

    def step(centroids, _):
        # [N, K] squared distances via ||p||² - 2 p·c + ||c||²; argmin over K.
        dots = jnp.dot(points, centroids.T, preferred_element_type=jnp.float32)
        c_norms = jnp.sum(centroids * centroids, axis=1)
        assign = jnp.argmax(2.0 * dots - c_norms[None, :], axis=1)  # min dist
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)  # [N, K]
        sums = jnp.dot(one_hot.T, points, preferred_element_type=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init, None, length=num_iters)
    return centroids


def train_pq(
    key: jax.Array,
    vectors: jax.Array,  # [N, D]
    num_subspaces: int = 8,
    num_clusters: int = 256,
    num_iters: int = 25,
) -> PQCodebook:
    """Train per-subspace codebooks. D must be divisible by num_subspaces."""
    n, d = vectors.shape
    assert d % num_subspaces == 0, "dim must divide evenly into subspaces"
    dsub = d // num_subspaces
    sub = vectors.reshape(n, num_subspaces, dsub).transpose(1, 0, 2)  # [M, N, Dsub]
    keys = jax.random.split(key, num_subspaces)
    k_eff = min(num_clusters, n)
    centroids = jax.vmap(lambda kk, pts: kmeans(kk, pts, k_eff, num_iters))(keys, sub)
    if k_eff < num_clusters:  # pad codebook so code ids stay uint8-stable
        pad = jnp.zeros((num_subspaces, num_clusters - k_eff, dsub), jnp.float32)
        centroids = jnp.concatenate([centroids, pad], axis=1)
    return PQCodebook(centroids=centroids)


@jax.jit
def pq_encode(codebook: PQCodebook, vectors: jax.Array) -> jax.Array:
    """Encode vectors → code ids [N, M] int32 (nearest centroid/subspace)."""
    n, d = vectors.shape
    m, k, dsub = codebook.centroids.shape
    sub = vectors.reshape(n, m, dsub)
    dots = jnp.einsum("nmd,mkd->nmk", sub, codebook.centroids, preferred_element_type=jnp.float32)
    c_norms = jnp.sum(codebook.centroids**2, axis=2)  # [M, K]
    return jnp.argmax(2.0 * dots - c_norms[None, :, :], axis=2).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def pq_adc_topk(
    codebook: PQCodebook,
    codes: jax.Array,  # [N, M] int32
    queries: jax.Array,  # [B, D] f32
    k: int,
    valid_n: jax.Array | int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """ADC scan: approximate dot(query, vec) = Σ_m LUT[b, m, codes[n, m]]."""
    n, m = codes.shape
    b, d = queries.shape
    dsub = d // m
    q_sub = queries.reshape(b, m, dsub)
    lut = jnp.einsum(
        "bmd,mkd->bmk", q_sub, codebook.centroids, preferred_element_type=jnp.float32
    )  # [B, M, K]
    # Gather-and-sum over subspaces: scores [B, N].
    scores = jnp.zeros((b, n), jnp.float32)
    for mi in range(m):  # static, small (8/16) — unrolled into one fused program
        scores = scores + lut[:, mi, :][:, codes[:, mi]]
    if valid_n is not None:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(row_ids < valid_n, scores, NEG_INF)
    s, i = jax.lax.top_k(scores, min(k, n))
    return s, i.astype(jnp.int32)
