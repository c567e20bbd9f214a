"""pq_rescore modes (VERDICT r2 #2 — PQ-only serving, no mandatory int8 mirror).

Contract:
- "int8" (default): round-2 behavior — int8 rescore mirror in HBM.
- "host": mirror lives in host RAM; device serves the ADC scan only (HBM at
  M+2 bytes/vec) and candidates are rescored host-side. Recall must match
  the "int8" path (same candidates, same int8 math).
- "none": no mirror anywhere; ranking is the ADC scores themselves.

Reference analog: the compression pillars of the reference README — its
ChromaDB store keeps full fp32 vectors; ours makes the M-bytes/vector story
end-to-end true on device.
"""

import numpy as np
import pytest


def _mk(n, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _pq_store(mode, mesh=None, **kw):
    from crs_tpu.rag.index import VectorStore

    cfg = {
        "format": "pq", "pq_rescore": mode, "block_size": 64,
        "pq_subspaces": 8, "pq_iters": 8, "pq_opq_iters": 1,
        "pq_coarse_clusters": 32, "rescore_k": 32,
    }
    cfg.update(kw)
    return VectorStore(cfg, mesh=mesh)


def test_invalid_mode_raises():
    from crs_tpu.rag.index import VectorStore

    with pytest.raises(ValueError, match="pq_rescore"):
        VectorStore({"format": "pq", "pq_rescore": "device"})


def test_host_mode_matches_int8_mode():
    """Same ADC candidates + same int8 rescore math → identical ids."""
    emb = _mk(400)
    texts = [f"doc {i}" for i in range(400)]
    q = _mk(6, seed=9)

    s_int8 = _pq_store("int8")
    s_int8.create_index(texts, emb)
    si, ii = s_int8.search_batch(q, top_k=5)

    s_host = _pq_store("host")
    s_host.create_index(texts, emb)
    sh, ih = s_host.search_batch(q, top_k=5)

    np.testing.assert_array_equal(np.asarray(ii), np.asarray(ih))
    np.testing.assert_allclose(np.asarray(si), np.asarray(sh), atol=1e-4)


def test_host_mode_hbm_excludes_mirror():
    """The device footprint must NOT include the int8 mirror; stats report
    the host mirror separately (the auditable M+2 B/vec HBM claim)."""
    emb = _mk(300)
    texts = [f"d{i}" for i in range(300)]

    s_host = _pq_store("host")
    s_host.create_index(texts, emb)
    assert s_host._codes is None and s_host._scales is None
    assert s_host._codes_host is not None

    s_int8 = _pq_store("int8")
    s_int8.create_index(texts, emb)
    assert s_host.memory_bytes() < s_int8.memory_bytes()
    stats = s_host.get_stats()
    assert stats["host_mirror_bytes"] > 0


def test_none_mode_pure_adc():
    """No mirror anywhere; self-retrieval still works on clustered data."""
    emb = _mk(300)
    texts = [f"d{i}" for i in range(300)]
    store = _pq_store("none")
    store.create_index(texts, emb)
    assert store._codes is None and store._codes_host is None
    s, i = store.search_batch(emb[:8], top_k=3)
    assert (np.asarray(i)[:, 0] == np.arange(8)).all()
    # per-row device bytes (codes + coarse ids) well under 1 B per dim;
    # codebooks are fixed overhead that amortizes at scale
    fixed = store._pq_codebook.centroids.nbytes + \
        store._rpq.rotation.nbytes + store._rpq.coarse.nbytes
    assert store.memory_bytes() - fixed < 300 * 32


def test_host_mode_persistence_roundtrip(tmp_path):
    emb = _mk(200)
    texts = [f"d{i}" for i in range(200)]
    q = _mk(4, seed=3)
    store = _pq_store("host")
    store.create_index(texts, emb)
    s1, i1 = store.search_batch(q, top_k=4)
    store.save(str(tmp_path))

    store2 = _pq_store("int8")  # meta must override the constructor default
    store2.load(str(tmp_path))
    assert store2.pq_rescore == "host"
    assert store2._codes_host is not None
    s2, i2 = store2.search_batch(q, top_k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_host_mode_masked_search():
    """`where` filtering composes with the host rescore."""
    from crs_tpu.rag.chunking import Chunk

    emb = _mk(256)
    chunks = [
        Chunk(text=f"doc {i}", chunk_id=f"c{i}", tokens=1,
              section="even" if i % 2 == 0 else "odd")
        for i in range(256)
    ]
    store = _pq_store("host")
    store.create_index(chunks, emb)
    s, i = store.search_batch(emb[:4], top_k=5, where={"section": "even"})
    ids = np.asarray(i)
    assert (ids % 2 == 0).all()
    # self-retrieval for even-id queries survives the filter
    assert (ids[::2, 0] == np.array([0, 2])).all()


def test_host_mode_incremental_add():
    emb = _mk(200)
    texts = [f"d{i}" for i in range(200)]
    store = _pq_store("host")
    store.create_index(texts[:120], emb[:120])
    store.add(texts[120:], emb[120:])
    assert store.n == 200
    s, i = store.search_batch(emb[150:154], top_k=3)
    assert (np.asarray(i)[:, 0] == np.arange(150, 154)).all()


def test_get_vectors_without_mirror():
    """MMR/diversity path needs dense vectors; with pq_rescore="none" they
    come from PQ reconstruction (approximate but usable)."""
    emb = _mk(200)
    texts = [f"d{i}" for i in range(200)]
    store = _pq_store("none")
    store.create_index(texts, emb)
    v = store.get_vectors(np.arange(16))
    assert v.shape == (16, 32)
    # reconstruction error bounded: cosine to the original > 0.8
    cos = np.sum(v * emb[:16], axis=1) / np.maximum(
        np.linalg.norm(v, axis=1), 1e-9
    )
    assert cos.mean() > 0.8, cos.mean()


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from crs_tpu.parallel.mesh import corpus_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return corpus_mesh(8)


@pytest.mark.parametrize("mode", ["host", "none"])
def test_sharded_store_pq_modes(mesh8, mode):
    """Mesh-sharded pq store in host/none modes matches the single-device
    store of the same mode (identical codebooks: same seed/config)."""
    emb = _mk(256)
    texts = [f"d{i}" for i in range(256)]
    q = _mk(4, seed=5)

    single = _pq_store(mode)
    single.create_index(texts, emb)
    s1, i1 = single.search_batch(q, top_k=5)

    sharded = _pq_store(mode, mesh=mesh8)
    sharded.create_index(texts, emb)
    assert sharded._codes is None  # no HBM mirror on the mesh either
    s2, i2 = sharded.search_batch(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_sharded_host_mode_masked(mesh8):
    from crs_tpu.rag.chunking import Chunk

    emb = _mk(256)
    chunks = [
        Chunk(text=f"doc {i}", chunk_id=f"c{i}", tokens=1,
              section="even" if i % 2 == 0 else "odd")
        for i in range(256)
    ]
    store = _pq_store("host", mesh=mesh8)
    store.create_index(chunks, emb)
    s, i = store.search_batch(emb[:4], top_k=5, where={"section": "even"})
    assert (np.asarray(i) % 2 == 0).all()


def test_sharded_host_mode_inplace_add_small_block(mesh8):
    """Regression (round-4 ADVICE): with mesh + pq_rescore='host' the host
    mirror is padded to a block_size multiple at create while the device
    arrays are shard-padded to a device-count multiple; when block_size is
    small vs the device count, `add` could fall inside the device padding
    (no _grow) yet past the host-mirror end — broadcast ValueError."""
    emb = _mk(132)
    texts = [f"d{i}" for i in range(132)]
    # block_size 4 << 8 devices: device padding slack exceeds one block
    store = _pq_store("host", mesh=mesh8, block_size=4,
                      pq_coarse_clusters=16)
    store.create_index(texts[:100], emb[:100])
    for lo in range(100, 132, 2):  # several tiny appends crossing the seam
        store.add(texts[lo:lo + 2], emb[lo:lo + 2])
    assert store.n == 132
    assert store._codes_host.shape[0] >= 132
    s, i = store.search_batch(emb[128:132], top_k=3)
    assert (np.asarray(i)[:, 0] == np.arange(128, 132)).all()


def test_host_mode_mmap_mirror(tmp_path):
    """Round 4: pq_host_mmap puts the rescore mirror in raw disk-backed
    memmap files (100M-row mirrors exceed RAM). Results must be identical
    to the RAM mirror; add() writes through; save/load reopens the maps."""
    import os

    v = _mk(600, seed=5)
    q = v[:6] + 0.01 * _mk(6, seed=6)

    ram = _pq_store("host")
    ram.create_index([f"d{i}" for i in range(500)], v[:500])
    s_ram, i_ram = ram.search_batch(q, top_k=5)

    mdir = tmp_path / "mirror"
    mm = _pq_store("host", pq_host_mmap=str(mdir))
    mm.create_index([f"d{i}" for i in range(500)], v[:500])
    assert isinstance(mm._codes_host, np.memmap)
    assert os.path.exists(mdir / "mirror_codes.i8")
    s_mm, i_mm = mm.search_batch(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(i_ram), np.asarray(i_mm))
    np.testing.assert_allclose(np.asarray(s_ram), np.asarray(s_mm),
                               rtol=1e-5, atol=1e-6)
    assert mm.get_stats()["host_mirror_mmap"] is True

    # in-place add writes through the map (and grows it via file replace)
    mm.add([f"d{i}" for i in range(500, 600)], v[500:600])
    ram.add([f"d{i}" for i in range(500, 600)], v[500:600])
    s2_mm, i2_mm = mm.search_batch(v[560:566], top_k=1)
    assert (np.asarray(i2_mm)[:, 0] == np.arange(560, 566)).mean() >= 0.8

    # save references the raw files instead of embedding 38GB-class npz
    sdir = tmp_path / "index"
    mm.save(str(sdir))
    import json
    meta = json.load(open(sdir / "index_meta.json"))
    assert "host_mirror_mmap" in meta
    import numpy as _np
    arrays = _np.load(sdir / "index_arrays.npz")
    assert "codes_host" not in arrays

    from crs_tpu.rag.index import VectorStore
    mm2 = VectorStore({"format": "pq"})
    mm2.load(str(sdir))
    assert isinstance(mm2._codes_host, np.memmap)
    s3, i3 = mm2.search_batch(q, top_k=5)
    s3b, i3b = mm.search_batch(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i3b))
