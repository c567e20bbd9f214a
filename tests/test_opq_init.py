"""Eigenvalue-allocation OPQ init (OPQ-P, Ge et al. CVPR 2013) — opt-in
``opq_init="eigen"``. Mechanical invariants only: on the CI-sized clustered
corpus the identity init already saturates recall and eigen measured
slightly WORSE (residuals there are near-isotropic noise); whether it pays
at the 1M+/4096-center scale is decided by tools/pq_recall_curve.py
--opq-init eigen, not asserted here."""

import numpy as np

from tests.test_residual_pq import hard_clustered_corpus


def _logprods(w_sorted, buckets):
    return [sum(np.log(max(w_sorted[i], 1e-12)) for i in b) for b in buckets]


def test_eigen_rotation_is_orthogonal_and_balanced():
    from crs_tpu.ops.pq import eigen_alloc_rotation

    x = hard_clustered_corpus(n=3000, d=128)
    m = 8
    r = eigen_alloc_rotation(x, m)
    assert r.shape == (128, 128)
    np.testing.assert_allclose(r.T @ r, np.eye(128), atol=1e-4)

    # allocation balances per-subspace eigenvalue products at least as well
    # as the contiguous PCA split
    cov = (x.astype(np.float64).T @ x) / len(x)
    w, _ = np.linalg.eigh(cov)
    w = w[np.argsort(-w)]
    xr = x @ r
    dsub = 128 // m
    var_prod = [float(np.sum(np.log(np.maximum(
        np.linalg.eigvalsh(np.cov(xr[:, s * dsub:(s + 1) * dsub].T)), 1e-12))))
        for s in range(m)]
    contiguous = [float(np.sum(np.log(np.maximum(w[s * dsub:(s + 1) * dsub],
                                                 1e-12))))
                  for s in range(m)]
    assert np.ptp(var_prod) <= np.ptp(contiguous) + 1e-6


def test_train_opq_eigen_init_runs():
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import pq_encode, train_opq, _pq_reconstruct

    x = hard_clustered_corpus(n=2000, d=64)
    r, cb = train_opq(jax.random.PRNGKey(0), jnp.asarray(x), 8, 64,
                      num_iters=5, opq_iters=1, init="eigen")
    np.testing.assert_allclose(np.asarray(r).T @ np.asarray(r), np.eye(64),
                               atol=1e-4)
    xr = jnp.asarray(x) @ r
    recon = _pq_reconstruct(cb, pq_encode(cb, xr))
    mse = float(np.mean((np.asarray(xr) - np.asarray(recon)) ** 2))
    assert mse < float(np.mean(np.asarray(xr) ** 2))  # actually quantizes


def test_store_opq_init_threads_through():
    from crs_tpu.rag.index import VectorStore

    x = hard_clustered_corpus(n=2000, d=64)
    store = VectorStore({
        "format": "pq", "block_size": 256, "pq_subspaces": 8,
        "pq_coarse_clusters": 64, "pq_iters": 5, "pq_opq_iters": 1,
        "pq_opq_init": "eigen", "rescore_k": 64,
    })
    store.create_index([f"d{i}" for i in range(len(x))], x)
    hits = np.asarray(store.search_batch(x[:8], top_k=1)[1])[:, 0]
    assert (hits == np.arange(8)).mean() >= 0.75
