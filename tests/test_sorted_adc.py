"""Sorted-coarse residual-ADC kernel: parity with the unsorted kernel.

The sorted variant (IVF-style layout + per-tile 512-id coarse window via
scalar prefetch) must return the SAME scores and — after mapping through the
sort permutation — the SAME ids as the unsorted kernel, for k <= kb and for
the k > kb repair path, with and without row masks, at group 1 and 2.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rpq_setup():
    import jax
    import jax.numpy as jnp

    from crs_tpu.ops.pq import (
        residual_codes_ext, residual_pq_encode, sort_codes_by_coarse,
        train_residual_pq,
    )

    rng = np.random.default_rng(11)
    n, d = 6000, 64
    # clustered corpus so coarse ids are non-trivial
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2.0
    v = centers[rng.integers(40, size=n)] + rng.standard_normal(
        (n, d)).astype(np.float32) * 0.3
    v = jnp.asarray(v)
    rpq = train_residual_pq(jax.random.PRNGKey(2), v, coarse_clusters=256,
                            num_subspaces=8, num_clusters=16, num_iters=3,
                            opq_iters=1, coarse_iters=3)
    cids, codes = residual_pq_encode(rpq, v)
    ext = residual_codes_ext(cids, codes)
    sorted_ext, perm, counts = sort_codes_by_coarse(ext, 256)
    q = jnp.asarray(rng.standard_normal((5, d)).astype(np.float32))
    return rpq, ext, sorted_ext, perm, counts, q, n


def _run_pair(rpq, ext, sorted_ext, perm, counts, q, n, k, block_size, group,
              mask=None, valid=None):
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import (
        pallas_topk_residual_pq_adc, pallas_topk_residual_pq_adc_sorted,
        plan_sorted_coarse_windows,
    )

    valid = n if valid is None else valid
    wbase = plan_sorted_coarse_windows(counts, n, block_size, group)
    assert wbase is not None

    # the unsorted baseline on the ORIGINAL layout
    s_u, i_u = pallas_topk_residual_pq_adc(
        rpq.rotation, rpq.coarse, rpq.codebook.centroids, ext, q, k, valid,
        block_size=block_size, row_mask=mask, group=group)

    # sorted kernel: permute rows (and mask), then map ids back through perm
    sorted_mask = None
    if mask is not None:
        sorted_mask = jnp.asarray(np.asarray(mask)[perm])
    # sorted layout: "valid" rows are no longer a prefix — express the
    # valid_n cut as a row mask in sorted order instead
    if valid != n:
        vm = np.zeros(n, bool)
        vm[:valid] = True
        vm = vm[perm]
        if sorted_mask is None:
            sorted_mask = jnp.asarray(vm)
        else:
            sorted_mask = sorted_mask & jnp.asarray(vm)
    s_s, i_s = pallas_topk_residual_pq_adc_sorted(
        rpq.rotation, rpq.coarse, rpq.codebook.centroids,
        jnp.asarray(sorted_ext), jnp.asarray(wbase), q, k, n,
        block_size=block_size, row_mask=sorted_mask, group=group)
    i_mapped = np.where(np.asarray(i_s) >= 0,
                        np.asarray(perm)[np.asarray(i_s)], -1)
    return (np.asarray(s_u), np.asarray(i_u)), (np.asarray(s_s), i_mapped)


@pytest.mark.parametrize("group", [1, 2])
def test_sorted_matches_unsorted_small_k(rpq_setup, group):
    (s_u, i_u), (s_s, i_m) = _run_pair(*rpq_setup, k=8, block_size=512,
                                       group=group)
    np.testing.assert_allclose(s_s, s_u, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(i_m, i_u)


def test_sorted_matches_unsorted_repair_path(rpq_setup):
    # k=48 > kb forces the ceiling/repair machinery through the sorted kernel
    (s_u, i_u), (s_s, i_m) = _run_pair(*rpq_setup, k=48, block_size=512,
                                       group=1)
    np.testing.assert_allclose(s_s, s_u, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(i_m, i_u)


def test_sorted_with_row_mask_and_valid_n(rpq_setup):
    rpq, ext, sorted_ext, perm, counts, q, n = rpq_setup
    rng = np.random.default_rng(3)
    mask = rng.random(n) < 0.7
    import jax.numpy as jnp

    (s_u, i_u), (s_s, i_m) = _run_pair(
        rpq, ext, sorted_ext, perm, counts, q, n, k=8, block_size=512,
        group=1, mask=jnp.asarray(mask), valid=n - 123)
    np.testing.assert_allclose(s_s, s_u, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(i_m, i_u)


def test_planner_refuses_fragmented_layout():
    from crs_tpu.ops.pallas_scan import plan_sorted_coarse_windows

    # 4096 clusters of 1 row each: a 2048-row tile spans 2048 ids > 512
    counts = np.ones(4096, np.int64)
    assert plan_sorted_coarse_windows(counts, 4096, 2048, 1) is None


def test_planner_covers_padding_tiles():
    from crs_tpu.ops.pallas_scan import plan_sorted_coarse_windows

    counts = np.zeros(256, np.int64)
    counts[0] = 100  # n=100 rows, one tile of 2048 → mostly padding
    wb = plan_sorted_coarse_windows(counts, 100, 2048, 1)
    assert wb is not None and wb.shape == (1,) and wb[0] == 0


def test_store_pq_sorted_matches_unsorted():
    """VectorStore(pq_sorted=True) must return the same ids/scores as the
    default store through the fused path (gate forced on for CPU CI)."""
    import jax.numpy as jnp

    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(7)
    n, d = 4096, 64
    centers = rng.standard_normal((30, d)).astype(np.float32)
    x = centers[rng.integers(30, size=n)] + 0.2 * rng.standard_normal(
        (n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    texts = [f"t{i}" for i in range(n)]
    cfg = {"format": "pq", "block_size": 512, "pq_subspaces": 8,
           "pq_coarse_clusters": 256, "pq_iters": 8, "pq_opq_iters": 1,
           "rescore_k": 32}
    q = jnp.asarray(x[:4] + 0.01 * rng.standard_normal((4, d)).astype(np.float32))

    stores = {}
    for name, sorted_flag in (("plain", False), ("sorted", True)):
        s = VectorStore({**cfg, "pq_sorted": sorted_flag})
        s._use_pallas = lambda: True  # force the fused gate on CPU
        s.create_index(texts, x)
        stores[name] = s.search_batch_dev(q, 5)
    s_p, i_p = stores["plain"]
    s_s, i_s = stores["sorted"]
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_p),
                               rtol=2e-3, atol=2e-3)


def test_store_pq_sorted_cache_invalidated_on_add():
    """Incremental add must rebuild the sorted layout (stale perm would
    return wrong ids)."""
    import jax.numpy as jnp

    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(9)
    n, d = 2048, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cfg = {"format": "pq", "block_size": 256, "pq_subspaces": 4,
           "pq_coarse_clusters": 256, "pq_iters": 5, "pq_opq_iters": 1,
           "rescore_k": 16}
    extra = rng.standard_normal((64, d)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    qe = jnp.asarray(np.concatenate([x[:2], extra[:2]]))

    results = {}
    for name, flag in (("plain", False), ("sorted", True)):
        s = VectorStore({**cfg, "pq_sorted": flag})
        s._use_pallas = lambda: True
        s.create_index([f"t{i}" for i in range(n)], x)
        s.search_batch_dev(jnp.asarray(x[:2]), 3)  # build caches pre-add
        if flag:
            assert s._pq_sorted_cache is not None
        s.add([f"n{i}" for i in range(64)], extra)
        if flag:
            assert s._pq_sorted_cache is None  # invalidated by the add
        results[name] = s.search_batch_dev(qe, 5)
    s_p, i_p = results["plain"]
    s_s, i_s = results["sorted"]
    # post-add parity: a stale perm would misreport ids here
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_p),
                               rtol=2e-3, atol=2e-3)


def test_sort_codes_by_coarse_roundtrip():
    from crs_tpu.ops.pq import sort_codes_by_coarse

    rng = np.random.default_rng(0)
    n = 500
    ext = rng.integers(0, 256, size=(n, 6)).astype(np.uint8)
    ext[:, 0] = rng.integers(0, 2, size=n)  # coarse ids < 512
    sorted_ext, perm, counts = sort_codes_by_coarse(ext, 512)
    cid = sorted_ext[:, 0].astype(int) * 256 + sorted_ext[:, 1]
    assert (np.diff(cid) >= 0).all()
    np.testing.assert_array_equal(sorted_ext, ext[perm])
    assert counts.sum() == n and counts.shape == (512,)
