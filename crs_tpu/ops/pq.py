"""Product quantization: on-device k-means codebooks + ADC top-k scan.

BASELINE.json config #4: the PQ-compressed index format. The vector dim is
split into M subspaces; each subspace gets a K-entry codebook trained by
Lloyd's k-means as a jitted ``lax.scan`` (the "batched k-means codebook
training on device" capability from SURVEY.md §2b); vectors are encoded as
[N, M] uint8 code ids (D·4 → M bytes compression); queries score candidates
via asymmetric distance computation (ADC): a per-query [M, K] lookup table of
subspace dot products, summed by code-id gather. Top candidates are exactly
rescored by the caller (see ``crs_tpu.rag.index``).

Round-2 additions (VERDICT r1 #4 — recall at high compression):

- **OPQ rotation** (:func:`train_opq`): an orthogonal rotation learned by
  alternating PQ training with a Procrustes solve, balancing variance across
  subspaces. On the hard clustered benchmark this lifts recall@10-in-100 at
  M=16 from 0.43 (plain) to 0.74.
- **Residual PQ** (:func:`train_residual_pq`): a coarse k-means quantizer
  (code = 1-2 bytes) plus OPQ-PQ on the residuals — the IVF-PQ encoding.
  coarse-2048 + residual M=12 reaches **0.92 recall at 14 bytes/vec** on the
  same benchmark (plain M=16 at 16 bytes: 0.43).

Round-4 addition (VERDICT r3 #2 — recall at fixed bytes/vec):

- **Anisotropic (score-aware) quantization loss** (``aniso_eta``): for MIPS
  retrieval the quantity that matters is the *score* error ⟨q, x − x̃⟩, and
  high-scoring queries concentrate near the datapoint's own direction — so
  quantization error parallel to x̂ costs recall while orthogonal error
  mostly doesn't (Guo et al., "Accelerating Large-Scale Inference with
  Anisotropic Vector Quantization", ICML 2020 — the ScaNN loss). Training
  and encoding minimize ``‖e‖² + (η−1)·⟨e, x̂⟩²`` instead of plain ‖e‖²;
  the centroid update becomes a batched [dsub, dsub] linear solve (one per
  codeword — matmul-shaped, runs on device). The full-vector loss is
  decomposed per-subspace by dropping the cross-subspace terms of
  ⟨e, x̂⟩² (x̂ sliced, not re-normalized, so per-subspace weights inherit
  the direction's energy split). ADC scoring is UNCHANGED — the codebooks
  just place codewords to preserve inner products better.
Round-4 MEASURED NEGATIVE (recorded, code removed — like round 3's seg2):
eigenvalue-allocation OPQ init (OPQ-P, Ge et al. CVPR 2013) LOSES on this
framework's MIPS-retrieval objective in every regime tested — residual
codebooks at 1M×384: recall@10-in-100 0.297 vs 0.841 identity-init;
plain OPQ on raw vectors, 8k×384: 0.900 vs 0.969 random-init
(results/pq_recall/curve_cpu_1m_eigen.json). Balancing per-subspace
eigenvalue PRODUCTS optimizes reconstruction MSE, but on clustered
corpora with fast-decaying spectra it concentrates the cluster-
discriminative energy into few subspaces — the noise-only subspaces
contribute nothing to ADC *ranking*, shrinking the effective code. A
random/identity init spreads discriminative energy across all codebooks
and the Procrustes alternation refines from there.

Everything is matmul-shaped for the MXU; the only host work is the 384²
SVD in the Procrustes step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PQCodebook", "train_pq", "pq_encode", "pq_adc_topk", "kmeans",
    "ResidualPQ", "train_opq", "train_residual_pq", "residual_pq_encode",
    "residual_codes_ext",
    "residual_pq_adc_topk",
    "aniso_eta_from_threshold",
]

NEG_INF = jnp.float32(-1e30)


class PQCodebook(NamedTuple):
    centroids: jax.Array  # [M, K, Dsub] f32


@partial(jax.jit, static_argnames=("num_clusters", "num_iters", "init"))
def kmeans(
    key: jax.Array,
    points: jax.Array,  # [N, D] f32
    num_clusters: int,
    num_iters: int = 25,
    init: str = "farthest",
) -> jax.Array:
    """Lloyd's k-means on device; returns centroids [num_clusters, D].

    ``init="farthest"`` (default): farthest-point init (deterministic given
    the key's first pick) avoids the empty-cluster collapse of plain random
    init — but its sequential scan costs O(C·N·D); ``init="sample"`` seeds
    from a random point sample instead (the right choice for large C, e.g.
    the residual-PQ coarse quantizer). Fixed iteration count as a
    ``lax.scan`` so the whole training loop is one compiled program. Empty
    clusters keep their previous centroid.
    """
    n, d = points.shape
    if init == "sample":
        sel = jax.random.choice(key, n, (num_clusters,), replace=num_clusters > n)
        initial = points[sel]
    else:
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
        initial = jnp.concatenate([c0[None, :], rest], axis=0)
    init_centroids = initial

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

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=num_iters)
    return centroids


def aniso_eta_from_threshold(threshold: float, dim: int) -> float:
    """ScaNN's parallel-cost weight η for unit-norm data: queries whose score
    with x exceeds ``threshold·‖x‖`` drive the expected score loss, giving
    η = (d−1)·T²/(1−T²) (Guo et al. 2020, Thm 3.2). T=0.2, d=384 → η ≈ 16."""
    t2 = float(threshold) ** 2
    return (dim - 1) * t2 / max(1.0 - t2, 1e-6)


# Anisotropic training subsample cap: the centroid update's Σ u·uᵀ term
# costs O(N·K·dsub²) per Lloyd iteration — at 256k sample rows that's ~2e11
# flops/iter/subspace, pointless for codebook estimation. 64k rows estimate
# 256 codewords/subspace with ≥250 rows each.
_ANISO_TRAIN_MAX = 65536


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def _kmeans_aniso(
    key: jax.Array,
    points: jax.Array,  # [N, D] f32 (one subspace's rows)
    dirs: jax.Array,  # [N, D] f32 — subspace slice of the unit datapoint
    num_clusters: int,
    num_iters: int,
    eta: jax.Array,  # scalar ≥ 1; 1 = isotropic
) -> jax.Array:
    """Lloyd's under the anisotropic loss ‖e‖² + (η−1)·⟨e, u⟩², e = x − c.

    Assignment expands the loss into matmuls (⟨x,c⟩, ⟨u,c⟩ tables); the
    update solves the per-codeword normal equations
    (n_k·I + (η−1)·Σ_{i∈k} u_i u_iᵀ)·c = Σ_{i∈k}(x_i + (η−1)⟨u_i,x_i⟩·u_i)
    as a batched [K, D, D] ``jnp.linalg.solve``. Empty clusters keep their
    previous centroid (their system is replaced by I·c = 0 and discarded).
    Sample init (aniso is only used for PQ codebooks, K ≪ N)."""
    n, d = points.shape
    sel = jax.random.choice(key, n, (num_clusters,), replace=num_clusters > n)
    init_centroids = points[sel]
    w = eta - 1.0
    a = jnp.sum(points * dirs, axis=1)  # [N] ⟨x, u⟩
    pnorm2 = jnp.sum(points * points, axis=1)
    ax = points + w * a[:, None] * dirs  # A_i x_i rows
    eye = jnp.eye(d, dtype=jnp.float32)

    def step(centroids, _):
        dots = jnp.dot(points, centroids.T, preferred_element_type=jnp.float32)
        udots = jnp.dot(dirs, centroids.T, preferred_element_type=jnp.float32)
        loss = (pnorm2[:, None] - 2.0 * dots
                + jnp.sum(centroids * centroids, axis=1)[None, :]
                + w * (a[:, None] - udots) ** 2)
        assign = jnp.argmin(loss, axis=1)
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)  # [K]
        s = jnp.dot(one_hot.T, ax, preferred_element_type=jnp.float32)  # [K, D]
        uu = jnp.einsum("nk,nd,ne->kde", one_hot, dirs, dirs,
                        preferred_element_type=jnp.float32)
        g = counts[:, None, None] * eye[None] + w * uu
        g = jnp.where(counts[:, None, None] > 0, g, eye[None])
        new = jnp.linalg.solve(g, s[..., None])[..., 0]
        new = jnp.where(counts[:, None] > 0, new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=num_iters)
    return centroids


def train_pq(
    key: jax.Array,
    vectors: jax.Array,  # [N, D]
    num_subspaces: int = 8,
    num_clusters: int = 256,
    num_iters: int = 25,
    dirs: Optional[jax.Array] = None,  # [N, D] unit datapoint directions
    aniso_eta: Optional[float] = None,
) -> PQCodebook:
    """Train per-subspace codebooks. D must be divisible by num_subspaces.

    With ``dirs`` + ``aniso_eta`` > 1, codebooks minimize the anisotropic
    (score-aware) loss instead of plain squared error — see module
    docstring. ``dirs`` rows are slices of the full unit vector (NOT
    re-normalized per subspace)."""
    n, d = vectors.shape
    assert d % num_subspaces == 0, "dim must divide evenly into subspaces"
    dsub = d // num_subspaces
    keys = jax.random.split(key, num_subspaces)
    k_eff = min(num_clusters, n)
    if dirs is not None and aniso_eta is not None and aniso_eta > 1.0:
        if n > _ANISO_TRAIN_MAX:
            stride = -(-n // _ANISO_TRAIN_MAX)
            vectors, dirs = vectors[::stride], dirs[::stride]
            n = vectors.shape[0]
        sub = vectors.reshape(n, num_subspaces, dsub).transpose(1, 0, 2)
        dsl = dirs.reshape(n, num_subspaces, dsub).transpose(1, 0, 2)
        centroids = jax.vmap(
            lambda kk, pts, dd: _kmeans_aniso(
                kk, pts, dd, k_eff, num_iters, jnp.float32(aniso_eta))
        )(keys, sub, dsl)
    else:
        sub = vectors.reshape(n, num_subspaces, dsub).transpose(1, 0, 2)  # [M, N, Dsub]
        centroids = jax.vmap(lambda kk, pts: kmeans(kk, pts, k_eff, num_iters))(keys, sub)
    if k_eff < num_clusters:  # pad codebook so code ids stay uint8-stable
        pad = jnp.zeros((num_subspaces, num_clusters - k_eff, dsub), jnp.float32)
        centroids = jnp.concatenate([centroids, pad], axis=1)
    return PQCodebook(centroids=centroids)


# Encode row-block size: the assignment tables are [B, M, K] f32 — dots,
# direction dots, and the combined score. At the old all-rows form a 1M-row
# chunk materialized 3 × [1M, 12, 256] f32 ≈ 34 GB of HLO temps and the
# aniso encode OOMed HBM on chip (r5 suite: "Used 17.17G of 15.75G" at BOTH
# 4M and 40M rows — row-count-independent ⇒ the per-chunk tables). 64k rows
# keep each table at ≤ 0.8 GB (M=16) while the einsums stay MXU-sized.
_ENCODE_BLOCK_ROWS = 1 << 16


def _pq_assign_block(centroids, c_norms, sub, dsl, aniso_eta):
    """Nearest-codeword ids for one row block. sub/dsl: [B, M, Dsub]."""
    dots = jnp.einsum("nmd,mkd->nmk", sub, centroids,
                      preferred_element_type=jnp.float32)
    score = 2.0 * dots - c_norms[None, :, :]  # maximize ⇔ min Euclidean
    if dsl is not None and aniso_eta is not None:
        w = jnp.float32(aniso_eta) - 1.0
        udots = jnp.einsum("nmd,mkd->nmk", dsl, centroids,
                           preferred_element_type=jnp.float32)
        a = jnp.sum(sub * dsl, axis=2)  # [B, M] ⟨x, u⟩ per subspace
        score = score - w * (a[..., None] - udots) ** 2
    return jnp.argmax(score, axis=2)


@jax.jit
def pq_encode(
    codebook: PQCodebook,
    vectors: jax.Array,
    dirs: Optional[jax.Array] = None,  # [N, D] unit datapoint directions
    aniso_eta: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode vectors → code ids [N, M] (nearest centroid per subspace).

    Codes are stored as uint8 when K ≤ 256 (the "M bytes/vector" claim is
    real on-device — int32 codes would quadruple the compressed corpus),
    int32 otherwise. With ``dirs`` + ``aniso_eta``, assignment minimizes the
    anisotropic loss the codebooks were trained under (one extra [N, M, K]
    direction-table einsum — ~2× encode cost, nothing at query time).
    Rows are processed in ``_ENCODE_BLOCK_ROWS`` blocks via ``lax.map`` so
    the [B, M, K] assignment tables never scale with N."""
    n, d = vectors.shape
    m, k, dsub = codebook.centroids.shape
    c_norms = jnp.sum(codebook.centroids**2, axis=2)  # [M, K]
    out_dtype = jnp.uint8 if k <= 256 else jnp.int32

    if n <= _ENCODE_BLOCK_ROWS:
        sub = vectors.reshape(n, m, dsub)
        dsl = dirs.reshape(n, m, dsub) if (
            dirs is not None and aniso_eta is not None) else None
        return _pq_assign_block(
            codebook.centroids, c_norms, sub, dsl, aniso_eta).astype(out_dtype)

    bs = _ENCODE_BLOCK_ROWS
    nb = -(-n // bs)
    pad = nb * bs - n
    vp = jnp.pad(vectors, ((0, pad), (0, 0))) if pad else vectors
    sub_b = vp.reshape(nb, bs, m, dsub)
    if dirs is not None and aniso_eta is not None:
        dp = jnp.pad(dirs, ((0, pad), (0, 0))) if pad else dirs
        dsl_b = dp.reshape(nb, bs, m, dsub)
        ids = jax.lax.map(
            lambda xs: _pq_assign_block(
                codebook.centroids, c_norms, xs[0], xs[1], aniso_eta),
            (sub_b, dsl_b),
        )
    else:
        ids = jax.lax.map(
            lambda xs: _pq_assign_block(codebook.centroids, c_norms, xs, None, None),
            sub_b,
        )
    return ids.reshape(nb * bs, m)[:n].astype(out_dtype)


# ---------------------------------------------------------------------------
# OPQ + residual (IVF-style) PQ
# ---------------------------------------------------------------------------


class ResidualPQ(NamedTuple):
    """OPQ rotation + coarse quantizer + residual PQ codebooks.

    Encoding of a vector x: r = xR; c = argmin ||r − coarse||;
    codes = PQ(r − coarse[c]). Storage: 1 coarse id (int32, counts ≤2 bytes
    for C ≤ 65536) + M residual bytes. ADC score of query q against row n:
    (qR)·coarse[c_n] + Σ_m LUT[m, codes[n, m]] — the coarse term is one more
    LUT gather with a [C]-wide table.
    """

    rotation: jax.Array  # [D, D] f32 orthogonal
    coarse: jax.Array  # [C, D] f32 centroids (rotated space)
    codebook: PQCodebook  # residual subspace codebooks (rotated space)


def _pq_reconstruct(codebook: PQCodebook, codes: jax.Array) -> jax.Array:
    cents = codebook.centroids  # [M, K, dsub]
    m = cents.shape[0]
    parts = [cents[mi][codes[:, mi]] for mi in range(m)]
    return jnp.concatenate(parts, axis=1)


def train_opq(
    key: jax.Array,
    vectors: jax.Array,  # [N, D] f32
    num_subspaces: int = 8,
    num_clusters: int = 256,
    num_iters: int = 20,
    opq_iters: int = 5,
    init_rotation: Optional[np.ndarray] = None,
    dirs: Optional[jax.Array] = None,  # [N, D] unit datapoint directions
    aniso_eta: Optional[float] = None,
) -> Tuple[jax.Array, PQCodebook]:
    """Learn (rotation, codebooks) by alternating PQ training and the
    orthogonal-Procrustes solve R = UVᵀ of SVD(Xᵀ·recon).

    ``dirs`` live in the same (un-rotated) space as ``vectors`` and are
    rotated alongside them each OPQ round (R is orthogonal, so rotated
    directions stay slices of a unit vector)."""
    d = vectors.shape[1]
    if init_rotation is not None:
        r = jnp.asarray(init_rotation, jnp.float32)
    else:
        rng = np.random.default_rng(0)
        r_np, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float64))
        r = jnp.asarray(r_np, jnp.float32)

    def _rot_dirs(rot):
        if dirs is None or aniso_eta is None:
            return None
        return jnp.dot(dirs, rot, preferred_element_type=jnp.float32)

    cb = None
    for _ in range(opq_iters):
        xr = jnp.dot(vectors, r, preferred_element_type=jnp.float32)
        dr = _rot_dirs(r)
        cb = train_pq(key, xr, num_subspaces, num_clusters, num_iters,
                      dirs=dr, aniso_eta=aniso_eta)
        codes = pq_encode(cb, xr, dr, aniso_eta)
        recon = _pq_reconstruct(cb, codes)
        cross = np.asarray(
            jnp.dot(vectors.T, recon, preferred_element_type=jnp.float32),
            np.float64,
        )
        u, _, vt = np.linalg.svd(cross, full_matrices=False)
        r = jnp.asarray(u @ vt, jnp.float32)
    xr = jnp.dot(vectors, r, preferred_element_type=jnp.float32)
    cb = train_pq(key, xr, num_subspaces, num_clusters, num_iters,
                  dirs=_rot_dirs(r), aniso_eta=aniso_eta)
    return r, cb


def train_residual_pq(
    key: jax.Array,
    vectors: jax.Array,  # [N, D] f32 (valid rows only)
    num_subspaces: int = 12,
    num_clusters: int = 256,
    coarse_clusters: int = 2048,
    num_iters: int = 20,
    opq_iters: int = 4,
    coarse_iters: int = 10,
    aniso_eta: Optional[float] = None,
) -> ResidualPQ:
    """IVF-style residual PQ with an OPQ rotation learned on the residuals.

    ``aniso_eta`` > 1 trains the residual codebooks under the anisotropic
    score-aware loss, weighting quantization error parallel to each
    datapoint's own direction x̂ (the direction high-scoring queries come
    from). The coarse quantizer stays Euclidean — its term in the ADC score
    is exact, so only the residual encoding contributes score error."""
    n, d = vectors.shape
    rng = np.random.default_rng(0)
    r0, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float64))
    r0 = jnp.asarray(r0, jnp.float32)
    xr = jnp.dot(vectors, r0, preferred_element_type=jnp.float32)
    c_eff = min(coarse_clusters, n)
    k1, k2 = jax.random.split(key)
    coarse = kmeans(k1, xr, c_eff, coarse_iters, init="sample")
    assign = _nearest(coarse, xr)
    residuals = xr - coarse[assign]
    # OPQ on the residuals, composed into one rotation R = r0 · r1 — but the
    # coarse centroids live in r0-space, so keep r0 as THE rotation and let
    # the residual codebooks absorb r1 implicitly: rotating residuals by r1
    # would de-align them from the coarse space. Instead run OPQ with the
    # identity init directly on residuals and KEEP its rotation applied to
    # both coarse and residual space (a global rotation commutes with the
    # coarse assignment since it preserves distances).
    dirs = None
    if aniso_eta is not None and aniso_eta > 1.0:
        # score-relevant direction = the (rotated) datapoint itself, NOT the
        # residual: score error is ⟨q, r − r̃⟩ and q concentrates near x̂
        dirs = xr / jnp.maximum(
            jnp.linalg.norm(xr, axis=1, keepdims=True), 1e-12)
    r1, cb = train_opq(
        k2, residuals, num_subspaces, num_clusters, num_iters, opq_iters,
        init_rotation=np.eye(d, dtype=np.float32),
        dirs=dirs, aniso_eta=aniso_eta,
    )
    rotation = jnp.dot(r0, r1, preferred_element_type=jnp.float32)
    coarse_rot = jnp.dot(coarse, r1, preferred_element_type=jnp.float32)
    return ResidualPQ(rotation=rotation, coarse=coarse_rot, codebook=cb)


@jax.jit
def _nearest(centroids: jax.Array, points: jax.Array) -> jax.Array:
    dots = jnp.dot(points, centroids.T, preferred_element_type=jnp.float32)
    c_norms = jnp.sum(centroids * centroids, axis=1)
    return jnp.argmax(2.0 * dots - c_norms[None, :], axis=1).astype(jnp.int32)


@jax.jit
def residual_pq_encode(
    rpq: ResidualPQ,
    vectors: jax.Array,
    aniso_eta: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Encode → (coarse_ids [N] int32, codes [N, M] uint8 for K ≤ 256).

    ``aniso_eta`` must match what the codebooks were trained with (the
    index threads its ``pq_aniso_eta`` config through both)."""
    xr = jnp.dot(vectors, rpq.rotation, preferred_element_type=jnp.float32)
    cids = _nearest(rpq.coarse, xr)
    dirs = None
    if aniso_eta is not None:
        dirs = xr / jnp.maximum(
            jnp.linalg.norm(xr, axis=1, keepdims=True), 1e-12)
    codes = pq_encode(rpq.codebook, xr - rpq.coarse[cids], dirs, aniso_eta)
    return cids, codes


def residual_codes_ext(coarse_ids: jax.Array, codes: jax.Array) -> jax.Array:
    """[N, M+2] uint8: coarse id split into (hi, lo) bytes + residual codes.

    The layout the fused residual-PQ Pallas scan consumes
    (:func:`crs_tpu.ops.pallas_scan.pallas_topk_residual_pq_adc`) — the
    whole compressed row, coarse id included, stays byte-wide and
    sublane-major. Requires C ≤ 65536 and K ≤ 256 — enforced here: a coarse
    id ≥ 65536 would silently wrap to a wrong two-byte pair and produce
    wrong retrieval scores downstream (ADVICE r2).
    """
    cid = coarse_ids.astype(jnp.int32)
    if cid.size and int(jnp.max(cid)) >= 65536:
        raise ValueError(
            "residual_codes_ext: coarse ids must be < 65536 (two uint8 bytes); "
            "reduce pq_coarse_clusters or use the unfused ADC path"
        )
    hi = (cid // 256).astype(jnp.uint8)
    lo = (cid % 256).astype(jnp.uint8)
    return jnp.concatenate(
        [hi[:, None], lo[:, None], codes.astype(jnp.uint8)], axis=1
    )


def sort_codes_by_coarse(
    codes_ext, num_coarse: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """IVF-style layout for the sorted residual-ADC kernel: stable-sort the
    [N, M+2] codes by coarse id. Returns ``(sorted_ext, perm, counts)`` —
    ``sorted_ext[r] == codes_ext[perm[r]]``, so kernel row ids map back to
    original ids via ``perm`` (a [B, k] gather); ``counts[c]`` = rows in
    coarse cluster c, the input of
    :func:`crs_tpu.ops.pallas_scan.plan_sorted_coarse_windows`. Host-side
    numpy on purpose: sorting is a one-time build cost and argsort of even
    10^8 uint16 keys is seconds, not a device program worth compiling.
    """
    ext = np.asarray(codes_ext)
    cid = ext[:, 0].astype(np.int64) * 256 + ext[:, 1].astype(np.int64)
    perm = np.argsort(cid, kind="stable")
    counts = np.bincount(cid, minlength=num_coarse)
    if counts.shape[0] > num_coarse:
        raise ValueError(
            f"sort_codes_by_coarse: coarse id {int(cid.max())} >= num_coarse "
            f"{num_coarse}")
    return ext[perm], perm.astype(np.int32), counts.astype(np.int64)


@partial(jax.jit, static_argnames=("k",))
def residual_pq_adc_topk(
    rpq: ResidualPQ,
    coarse_ids: jax.Array,  # [N] int32
    codes: jax.Array,  # [N, M] int32
    queries: jax.Array,  # [B, D] f32
    k: int,
    valid_n: jax.Array | int | None = None,
    row_mask: jax.Array | None = None,  # [N] bool — metadata `where` filter
) -> Tuple[jax.Array, jax.Array]:
    """ADC with the coarse term: score = qR·coarse[c_n] + residual ADC."""
    n = codes.shape[0]
    qr = jnp.dot(queries, rpq.rotation, preferred_element_type=jnp.float32)
    coarse_lut = jnp.dot(qr, rpq.coarse.T, preferred_element_type=jnp.float32)  # [B, C]
    m = codes.shape[1]
    b, d = qr.shape
    dsub = d // m
    q_sub = qr.reshape(b, m, dsub)
    lut = jnp.einsum(
        "bmd,mkd->bmk", q_sub, rpq.codebook.centroids, preferred_element_type=jnp.float32
    )
    if n > _ADC_DENSE_MAX_ROWS:
        return _blockwise_adc_topk(
            lut, codes, _adc_bias(n, valid_n, row_mask), k,
            coarse_lut=coarse_lut, coarse_ids=coarse_ids,
        )
    scores = coarse_lut[:, coarse_ids]  # [B, N]
    for mi in range(m):
        scores = scores + lut[:, mi, :][:, codes[:, mi]]
    if valid_n is not None:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(row_ids < valid_n, scores, NEG_INF)
    if row_mask is not None:
        scores = jnp.where(row_mask[None, :], scores, NEG_INF)
    s, i = jax.lax.top_k(scores, min(k, n))
    return s, i.astype(jnp.int32)


# dense ADC materializes per-subspace [B, N] gather temps that XLA fails to
# fuse — 12 × [10M, B] f32 planned 57 GB of HLO temps at 10M rows (compile
# OOM). Past this row count the scan goes blockwise: O(B · block) memory.
_ADC_DENSE_MAX_ROWS = 1 << 18


@partial(jax.jit, static_argnames=("k", "block_rows"))
def _blockwise_adc_topk(
    lut: jax.Array,  # [B, M, K] f32 per-query subspace LUTs
    codes: jax.Array,  # [N, M] int32
    bias: jax.Array,  # [N] f32 — 0 for allowed rows, NEG_INF otherwise
    k: int,
    coarse_lut: jax.Array | None = None,  # [B, C] (residual PQ)
    coarse_ids: jax.Array | None = None,  # [N] int32
    block_rows: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Memory-lean ADC: lax.scan over row blocks, per-block top-k, one merge.

    Scores and gather temps never exceed [B, block_rows]; the result is
    identical to the dense form (every block emits its full local top-k and
    the final merge is exact over the emitted candidates — k winners per
    query can never exceed k per block).
    """
    n, m = codes.shape
    b = lut.shape[0]
    nb = -(-n // block_rows)
    pad = nb * block_rows - n
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        bias = jnp.pad(bias, (0, pad), constant_values=NEG_INF)
        if coarse_ids is not None:
            coarse_ids = jnp.pad(coarse_ids, (0, pad))
    codes_b = codes.reshape(nb, block_rows, m)
    bias_b = bias.reshape(nb, block_rows)
    xs = (codes_b, bias_b)
    if coarse_ids is not None:
        xs = xs + (coarse_ids.reshape(nb, block_rows),)

    k_eff = min(k, block_rows)

    def step(base, blk):
        cb, bb = blk[0], blk[1]
        s = bb[None, :]
        if coarse_lut is not None:
            s = s + coarse_lut[:, blk[2]]
        for mi in range(m):
            s = s + lut[:, mi, :][:, cb[:, mi]]
        top_s, top_i = jax.lax.top_k(s, k_eff)
        return base + block_rows, (top_s, top_i + base)

    _, (all_s, all_i) = jax.lax.scan(step, jnp.int32(0), xs)
    flat_s = all_s.transpose(1, 0, 2).reshape(b, nb * k_eff)
    flat_i = all_i.transpose(1, 0, 2).reshape(b, nb * k_eff)
    top_s, sel = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
    top_i = jnp.take_along_axis(flat_i, sel, axis=1)
    return top_s, top_i.astype(jnp.int32)


def _adc_bias(n, valid_n, row_mask):
    allowed = jnp.ones((n,), jnp.bool_)
    if valid_n is not None:
        allowed = jnp.arange(n) < jnp.asarray(valid_n, jnp.int32)
    if row_mask is not None:
        allowed = allowed & row_mask
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


@partial(jax.jit, static_argnames=("k",))
def pq_adc_topk(
    codebook: PQCodebook,
    codes: jax.Array,  # [N, M] int32
    queries: jax.Array,  # [B, D] f32
    k: int,
    valid_n: jax.Array | int | None = None,
    row_mask: jax.Array | None = None,  # [N] bool — metadata `where` filter
) -> Tuple[jax.Array, jax.Array]:
    """ADC scan: approximate dot(query, vec) = Σ_m LUT[b, m, codes[n, m]]."""
    n, m = codes.shape
    b, d = queries.shape
    dsub = d // m
    q_sub = queries.reshape(b, m, dsub)
    lut = jnp.einsum(
        "bmd,mkd->bmk", q_sub, codebook.centroids, preferred_element_type=jnp.float32
    )  # [B, M, K]
    if n > _ADC_DENSE_MAX_ROWS:
        return _blockwise_adc_topk(lut, codes, _adc_bias(n, valid_n, row_mask), k)
    # Gather-and-sum over subspaces: scores [B, N].
    scores = jnp.zeros((b, n), jnp.float32)
    for mi in range(m):  # static, small (8/16) — unrolled into one fused program
        scores = scores + lut[:, mi, :][:, codes[:, mi]]
    if valid_n is not None:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        scores = jnp.where(row_ids < valid_n, scores, NEG_INF)
    if row_mask is not None:
        scores = jnp.where(row_mask[None, :], scores, NEG_INF)
    s, i = jax.lax.top_k(scores, min(k, n))
    return s, i.astype(jnp.int32)
