"""Anisotropic (score-aware) PQ loss — VERDICT r3 #2 (recall at fixed
bytes/vec). Reference parity target: the compression pillar of
/root/reference/README.md; the loss is ScaNN's (Guo et al., ICML 2020).

Invariants tested:
  * η(T, d) formula matches Thm 3.2's closed form and is monotone in T.
  * aniso encode assignment is the exact argmin of the explicit loss
    ‖e‖² + (η−1)·⟨e, u⟩² per subspace (brute-force check).
  * aniso Lloyd's reduces the aniso loss it claims to minimize.
  * trained aniso codebooks reduce *score* error ⟨q, x − x̃⟩ on
    high-scoring (query, doc) pairs vs isotropic codebooks — the quantity
    the loss is a surrogate for.
  * VectorStore threads pq_aniso_eta through create/add/save/load.
"""

import numpy as np
import pytest

from tests.test_residual_pq import hard_clustered_corpus


@pytest.fixture(scope="module")
def corpus():
    x = hard_clustered_corpus(n=4000, d=128)
    rng = np.random.default_rng(7)
    qi = rng.choice(len(x), 32, replace=False)
    q = x[qi] + 0.02 * rng.standard_normal((32, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return x, q


def test_eta_from_threshold_formula():
    from crs_tpu.ops.pq import aniso_eta_from_threshold

    # (d−1)·T²/(1−T²): T=0.2, d=384 → 383·0.04/0.96 ≈ 15.958
    assert abs(aniso_eta_from_threshold(0.2, 384) - 383 * 0.04 / 0.96) < 1e-9
    # monotone in T, → 0 as T → 0
    assert aniso_eta_from_threshold(0.4, 384) > aniso_eta_from_threshold(0.2, 384)
    assert aniso_eta_from_threshold(0.0, 384) == 0.0


def _explicit_loss(x, c, u, eta):
    """‖x−c‖² + (η−1)·⟨x−c, u⟩² — the per-subspace aniso loss, on host."""
    e = x[:, None, :] - c[None, :, :]  # [N, K, D]
    par = np.einsum("nkd,nd->nk", e, u)
    return np.sum(e * e, axis=2) + (eta - 1.0) * par**2


def test_aniso_encode_is_exact_argmin():
    import jax.numpy as jnp

    from crs_tpu.ops.pq import PQCodebook, pq_encode

    rng = np.random.default_rng(0)
    n, d, m, k, eta = 200, 32, 4, 16, 8.0
    dsub = d // m
    x = rng.standard_normal((n, d)).astype(np.float32)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = rng.standard_normal((m, k, dsub)).astype(np.float32)
    codes = np.asarray(pq_encode(
        PQCodebook(jnp.asarray(cents)), jnp.asarray(x), jnp.asarray(u),
        jnp.float32(eta)))
    for s in range(m):
        want = np.argmin(_explicit_loss(
            x[:, s * dsub:(s + 1) * dsub], cents[s],
            u[:, s * dsub:(s + 1) * dsub], eta), axis=1)
        np.testing.assert_array_equal(codes[:, s], want)


def test_aniso_encode_eta_none_matches_plain():
    import jax.numpy as jnp

    from crs_tpu.ops.pq import PQCodebook, pq_encode

    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 32)).astype(np.float32)
    cents = rng.standard_normal((4, 16, 8)).astype(np.float32)
    cb = PQCodebook(jnp.asarray(cents))
    np.testing.assert_array_equal(
        np.asarray(pq_encode(cb, jnp.asarray(x))),
        np.asarray(pq_encode(cb, jnp.asarray(x), None, None)))


def test_aniso_kmeans_reduces_its_loss():
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import _kmeans_aniso

    rng = np.random.default_rng(2)
    n, d, k, eta = 800, 16, 8, 6.0
    x = rng.standard_normal((n, d)).astype(np.float32)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    key = jax.random.PRNGKey(3)

    def total_loss(cents):
        l = _explicit_loss(x, np.asarray(cents), u, eta)
        return float(np.sum(np.min(l, axis=1)))

    c1 = _kmeans_aniso(key, jnp.asarray(x), jnp.asarray(u), k, 1, jnp.float32(eta))
    c10 = _kmeans_aniso(key, jnp.asarray(x), jnp.asarray(u), k, 10, jnp.float32(eta))
    assert total_loss(c10) <= total_loss(c1) * 1.0001


def test_aniso_training_reduces_score_error(corpus):
    """The point of the loss: squared *score* error on (q, true-top-10 doc)
    pairs drops vs isotropic training at the same bytes/vec."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import _pq_reconstruct, pq_encode, train_pq

    x, q = corpus
    exact = np.argsort(-(q @ x.T), axis=1)[:, :10]
    xj = jnp.asarray(x)
    u = xj / jnp.linalg.norm(xj, axis=1, keepdims=True)
    m = 8

    def score_err(recon):
        err = 0.0
        for i in range(len(q)):
            docs = exact[i]
            err += float(np.mean(
                (q[i] @ (x[docs] - np.asarray(recon)[docs]).T) ** 2))
        return err / len(q)

    cb_iso = train_pq(jax.random.PRNGKey(0), xj, m, 256, 15)
    rec_iso = _pq_reconstruct(cb_iso, pq_encode(cb_iso, xj))
    cb_an = train_pq(jax.random.PRNGKey(0), xj, m, 256, 15,
                     dirs=u, aniso_eta=10.0)
    rec_an = _pq_reconstruct(
        cb_an, pq_encode(cb_an, xj, u, jnp.float32(10.0)))
    e_iso, e_an = score_err(rec_iso), score_err(rec_an)
    assert e_an < e_iso, (e_an, e_iso)


def test_aniso_residual_recall_not_worse(corpus):
    """Residual PQ + aniso must stay a working encoder (recall within noise
    of isotropic or better on the CI corpus — the big-D win is measured on
    chip by tools/pq_recall_curve.py --etas)."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import (
        residual_pq_adc_topk, residual_pq_encode, train_residual_pq,
    )

    x, q = corpus
    exact = np.argsort(-(q @ x.T), axis=1)[:, :10]

    def recall(rpq, eta):
        cids, codes = residual_pq_encode(rpq, jnp.asarray(x), eta)
        _, cand = residual_pq_adc_topk(
            rpq, cids, codes, jnp.asarray(q), 100, len(x))
        cand = np.asarray(cand)
        return np.mean([len(set(exact[i]) & set(cand[i])) / 10
                        for i in range(len(q))])

    kw = dict(num_subspaces=8, coarse_clusters=256, num_iters=10, opq_iters=2)
    r_iso = recall(train_residual_pq(jax.random.PRNGKey(0), jnp.asarray(x),
                                     **kw), None)
    r_an = recall(train_residual_pq(jax.random.PRNGKey(0), jnp.asarray(x),
                                    aniso_eta=10.0, **kw), jnp.float32(10.0))
    assert r_an >= r_iso - 0.03, (r_an, r_iso)


def test_store_aniso_roundtrip(tmp_path, corpus):
    from crs_tpu.rag.index import VectorStore

    x, q = corpus
    store = VectorStore({
        "format": "pq", "block_size": 256, "pq_subspaces": 8,
        "pq_coarse_clusters": 128, "pq_iters": 8, "pq_opq_iters": 2,
        "pq_aniso_eta": "auto", "rescore_k": 64,
    })
    store.create_index([f"d{i}" for i in range(3000)], x[:3000])
    # "auto" resolves against the live dim (128 → η ≈ 5.3)
    assert store._aniso_eta() is not None and store._aniso_eta() > 1.0
    # incremental add re-encodes with the SAME aniso assignment
    store.add([f"d{i}" for i in range(3000, 3500)], x[3000:3500])
    hits = np.asarray(store.search_batch(x[3100:3108], top_k=1)[1])[:, 0]
    assert (hits == np.arange(3100, 3108)).mean() >= 0.75
    s, ids = store.search_batch(q[:8], top_k=5)
    store.save(str(tmp_path))
    store2 = VectorStore({"format": "pq"})
    store2.load(str(tmp_path))
    assert store2.pq_aniso_eta == "auto"  # η roundtrips through save/load
    s2, ids2 = store2.search_batch(q[:8], top_k=5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_store_aniso_off_by_default():
    from crs_tpu.rag.index import VectorStore

    assert VectorStore({"format": "pq"})._aniso_eta() is None
    assert VectorStore({"format": "pq", "pq_aniso_eta": 1.0})._aniso_eta() is None
    assert VectorStore({"format": "pq", "pq_aniso_eta": 4.0})._aniso_eta() == 4.0


def test_aniso_kmeans_empty_cluster_robust():
    """K near N forces empty clusters; the solve must stay finite (empty
    systems are replaced by I·c = 0 and the previous centroid kept)."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import _kmeans_aniso

    rng = np.random.default_rng(5)
    x = np.repeat(rng.standard_normal((4, 8)).astype(np.float32), 8, axis=0)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = _kmeans_aniso(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(u),
                      16, 5, jnp.float32(8.0))
    assert np.all(np.isfinite(np.asarray(c)))


def test_encode_blockwise_matches_all_rows(monkeypatch):
    """pq_encode processes rows in _ENCODE_BLOCK_ROWS blocks (the all-rows
    form materialized 3 x [N, M, K] f32 tables and OOMed HBM at 17.17G on
    chip — r5 suite, row-count independent). Blocked == unblocked, plain
    and aniso, including a block size that does not divide N."""
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops import pq

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    cb = pq.train_pq(jax.random.PRNGKey(0), jnp.asarray(x),
                     num_subspaces=4, num_clusters=16, num_iters=5)
    plain = np.asarray(pq.pq_encode(cb, jnp.asarray(x)))
    aniso = np.asarray(pq.pq_encode(cb, jnp.asarray(x), dirs=jnp.asarray(u),
                                    aniso_eta=4.0))
    monkeypatch.setattr(pq, "_ENCODE_BLOCK_ROWS", 96)  # pad path: 96 ∤ 1000
    jax.clear_caches()
    np.testing.assert_array_equal(plain, np.asarray(pq.pq_encode(cb, jnp.asarray(x))))
    np.testing.assert_array_equal(
        aniso,
        np.asarray(pq.pq_encode(cb, jnp.asarray(x), dirs=jnp.asarray(u),
                                aniso_eta=4.0)))
    assert plain.dtype == np.uint8
