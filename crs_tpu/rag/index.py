"""HBM-resident compressed vector store.

TPU-native replacement for the reference's ChromaDB-backed ``VectorStore``
(``rag/indexing.py:14-211``): instead of a CPU-side HNSW graph, the corpus
lives on device as dense arrays in one of four formats — answering the same
query signature so benchmarks compare formats exactly like the reference
compares model quantizations (SURVEY.md §7 "engine variants as index
formats"):

- ``fp32`` / ``bf16`` — exact cosine scan (the golden path),
- ``int8``  — per-vector scalar quantization, int8 MXU scan + fp32 rescore,
- ``pq``    — product-quantization codebooks, ADC LUT scan + exact rescore
  against int8 codes kept alongside (compression still ≥3x vs fp32).

API parity with the reference store: ``create_index(chunks, embeddings)``
(:57-123), ``search(query_embedding, top_k, where)`` returning
ids/documents/metadatas/distances (:125-180), ``delete``/``reset``/
``get_stats`` (:182-211), plus persistence (save/load) replacing ChromaDB's
``persist_directory`` behavior (:30-37).
"""

from __future__ import annotations

import json
import logging
import os
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_scan import pallas_topk, pallas_topk_int8, pallas_topk_pq_adc
from ..ops.pq import (
    PQCodebook, ResidualPQ, aniso_eta_from_threshold, pq_adc_topk, pq_encode,
    residual_pq_adc_topk, residual_pq_encode, train_pq, train_residual_pq,
)
from ..ops.quant import int8_topk, scalar_quantize
from ..ops.topk import blockwise_topk, exact_topk

logger = logging.getLogger(__name__)

__all__ = ["VectorStore", "INDEX_FORMATS"]

INDEX_FORMATS = ("fp32", "bf16", "int8", "pq")


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    n = arr.shape[0]
    padded = -(-n // multiple) * multiple
    if padded == n:
        return arr
    pad = np.zeros((padded - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class VectorStore:
    """Stateful shell around the on-device index arrays + host metadata."""

    def __init__(self, config: Optional[Dict[str, Any]] = None, mesh=None):
        config = config or {}
        self.format = config.get("format", "fp32")
        if self.format not in INDEX_FORMATS:
            raise ValueError(f"unknown index format: {self.format}")
        # 4096 amortizes the ~5 µs fixed per-grid-step cost of the Pallas
        # scan (measured 2.2× over 1024 at 10M rows; ops/pallas_scan.py)
        self.block_size = int(config.get("block_size", 4096))
        self.persist_directory = config.get("persist_directory")
        self.rescore_k = int(config.get("rescore_k", 64))
        # Round 2: residual (IVF-style) PQ with an OPQ rotation is the
        # default — coarse-2048 + M=12 residual bytes measures 0.92+
        # recall@10-in-100 on the hard clustered benchmark at 14 bytes/vec
        # (plain M=16 PQ: 0.43). pq_residual=False restores round-1 plain PQ.
        self.pq_residual = bool(config.get("pq_residual", True))
        self.pq_subspaces = int(config.get(
            "pq_subspaces", 12 if self.pq_residual else 48))
        self.pq_clusters = int(config.get("pq_clusters", 256))
        self.pq_iters = int(config.get("pq_iters", 25))
        self.pq_coarse_clusters = config.get("pq_coarse_clusters", "auto")
        self.pq_opq_iters = int(config.get("pq_opq_iters", 4))
        # Round 4 (VERDICT r3 #2): anisotropic score-aware quantization loss
        # (ScaNN, Guo et al. 2020) — η > 1 weights quantization error
        # parallel to each datapoint's direction, lifting recall at fixed
        # bytes/vec. 0/1 = off; "auto" = η(T=0.2, dim). See ops/pq.py.
        self.pq_aniso_eta = config.get("pq_aniso_eta", 0.0)
        # Round 3 (VERDICT r2 #2) — where the pq format keeps its exact-ish
        # rescore mirror:
        #   "int8": int8 codes in HBM alongside the PQ codes (round-2
        #           behavior; bounds compression at ~D bytes/vec),
        #   "host": int8 codes in host RAM; candidates are gathered and
        #           rescored host-side — HBM serves at M+2 bytes/vec with
        #           recall IDENTICAL to the int8 path (>40M-row corpora),
        #   "none": no mirror anywhere; candidates rank by their ADC scores
        #           (exact w.r.t. the compressed codes) — M+2 bytes/vec
        #           total, recall bounded by code fidelity.
        self.pq_rescore = str(config.get("pq_rescore", "int8"))
        if self.pq_rescore not in ("int8", "host", "none"):
            raise ValueError(f"unknown pq_rescore mode: {self.pq_rescore}")
        # Round 4: directory for a DISK-BACKED host mirror (np.memmap).
        # pq_rescore="host" at 100M×384 needs a 38 GB mirror — beyond RAM;
        # memmap serves it from the page cache (gathers fault in only the
        # candidate rows). Empty/None = keep the mirror in RAM.
        self.pq_host_mmap = config.get("pq_host_mmap") or None
        # Round 5: IVF-style sorted-coarse layout for the fused residual-ADC
        # scan — rows sorted by coarse id let each kernel grid tile use a
        # 512-id coarse window instead of sweeping all C ids (~2.4x less
        # kernel work at C=4096; see ops/pallas_scan.py sorted variant).
        # Derived cache only: persistence stays in canonical (insertion)
        # order and results map back through the sort permutation.
        self.pq_sorted = bool(config.get("pq_sorted", False))
        self.seed = int(config.get("seed", 0))
        # Optional device mesh: corpus rows shard across the mesh's corpus
        # axis and queries run the shard_map scan + allgather merge
        # (BASELINE.json config #5). None → single-device arrays.
        self.mesh = mesh
        self._clear()
        if self.persist_directory and os.path.exists(
            os.path.join(self.persist_directory, "index_meta.json")
        ):
            self.load(self.persist_directory)

    def _clear(self) -> None:
        self.n = 0
        self.dim = 0
        self.ids: List[str] = []
        self.documents: List[str] = []
        self.metadatas: List[Dict[str, Any]] = []
        self._vectors: Optional[jax.Array] = None  # fp32/bf16 formats
        self._codes: Optional[jax.Array] = None  # int8 codes (int8/pq rescore)
        self._scales: Optional[jax.Array] = None
        self._pq_codebook: Optional[PQCodebook] = None
        self._pq_codes: Optional[jax.Array] = None
        self._rpq: Optional[ResidualPQ] = None  # residual-PQ structure
        self._pq_coarse_ids: Optional[jax.Array] = None
        # fused-scan codes cache: invalidated at EVERY mutation point
        # (_clear/add/load) — keying on self.n alone returned stale codes
        # after re-indexing a same-size corpus (ADVICE r2, medium)
        self._pq_codes_ext: Optional[jax.Array] = None
        # sorted-coarse layout cache (pq_sorted): (sorted_ext_dev, perm_dev,
        # counts_np) + per-group window plans; invalidated with _pq_codes_ext
        self._pq_sorted_cache = None
        self._pq_wbase: Dict[int, Optional[np.ndarray]] = {}
        # host-RAM rescore mirror (pq_rescore="host")
        self._codes_host: Optional[np.ndarray] = None
        self._scales_host: Optional[np.ndarray] = None
        # typed metadata columns for vectorized `where` masks, built lazily
        # per key; entries self-invalidate when len(metadatas) changes
        self._md_cols: Dict[str, Tuple[np.ndarray, np.ndarray, int]] = {}

    # -- host rescore mirror (RAM or disk-backed) ---------------------------
    _MMAP_CODES = "mirror_codes.i8"
    _MMAP_SCALES = "mirror_scales.f32"

    def _mirror_alloc(self, rows: int, cols: int) -> Tuple[np.ndarray, np.ndarray]:
        """Allocate the pq_rescore="host" mirror: RAM by default; raw
        np.memmap files under ``pq_host_mmap`` when set (mirrors beyond
        RAM — 38 GB at 100M×384 — serve from the page cache)."""
        if self.pq_host_mmap:
            os.makedirs(self.pq_host_mmap, exist_ok=True)
            c = np.memmap(os.path.join(self.pq_host_mmap, self._MMAP_CODES),
                          np.int8, mode="w+", shape=(rows, cols))
            s = np.memmap(os.path.join(self.pq_host_mmap, self._MMAP_SCALES),
                          np.float32, mode="w+", shape=(rows,))
            return c, s
        return np.zeros((rows, cols), np.int8), np.zeros((rows,), np.float32)

    def _mirror_set(self, codes: np.ndarray, scales: np.ndarray) -> None:
        """Install a freshly computed mirror (create_index paths)."""
        self._codes_host, self._scales_host = self._mirror_alloc(
            codes.shape[0], codes.shape[1])
        self._codes_host[:] = codes
        self._scales_host[:] = scales

    def _mirror_grow(self, new_rows: int) -> None:
        """Grow the mirror to ``new_rows`` (zero-padded). RAM: concatenate.
        memmap: chunk-copy into new raw files, then atomically replace —
        np.memmap cannot resize in place."""
        old_c, old_s = self._codes_host, self._scales_host
        if old_c.shape[0] >= new_rows:
            return
        cols = old_c.shape[1]
        if self.pq_host_mmap:
            cpath = os.path.join(self.pq_host_mmap, self._MMAP_CODES)
            spath = os.path.join(self.pq_host_mmap, self._MMAP_SCALES)
            nc = np.memmap(cpath + ".grow", np.int8, mode="w+",
                           shape=(new_rows, cols))
            ns = np.memmap(spath + ".grow", np.float32, mode="w+",
                           shape=(new_rows,))
            step = 1 << 20  # 1M rows per copy chunk — bounded RAM
            for lo in range(0, old_c.shape[0], step):
                hi = min(lo + step, old_c.shape[0])
                nc[lo:hi] = old_c[lo:hi]
                ns[lo:hi] = old_s[lo:hi]
            nc.flush(); ns.flush()
            del old_c, old_s  # release the mapping before replacing files
            self._codes_host = self._scales_host = None
            os.replace(cpath + ".grow", cpath)
            os.replace(spath + ".grow", spath)
            self._codes_host = np.memmap(cpath, np.int8, mode="r+",
                                         shape=(new_rows, cols))
            self._scales_host = np.memmap(spath, np.float32, mode="r+",
                                          shape=(new_rows,))
        else:
            pad = new_rows - old_c.shape[0]
            self._codes_host = np.concatenate(
                [old_c, np.zeros((pad, cols), np.int8)])
            self._scales_host = np.concatenate(
                [old_s, np.zeros((pad,), np.float32)])

    def _aniso_eta(self) -> Optional[float]:
        """Resolve pq_aniso_eta config → η for ops/pq.py (None = isotropic)."""
        e = self.pq_aniso_eta
        if e == "auto":
            # uses the live dim — only meaningful once vectors are known
            # (create_index sets dim before any _aniso_eta call on the
            # build/encode paths); tiny dims give η ≤ 1 → isotropic
            e = aniso_eta_from_threshold(0.2, max(self.dim, 2))
        else:
            e = float(e)
        return e if e > 1.0 else None

    # -- build -------------------------------------------------------------
    def create_index(
        self,
        chunks: Sequence[Any],
        embeddings: np.ndarray,
        ids: Optional[Sequence[str]] = None,
    ) -> None:
        """Build the index from chunks + their embeddings (reference :57-123)."""
        if len(chunks) != embeddings.shape[0]:
            raise ValueError("chunks and embeddings length mismatch")
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be [N, D]")
        self._clear()
        self.n = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        for i, c in enumerate(chunks):
            if hasattr(c, "text"):
                self.ids.append(c.chunk_id)
                self.documents.append(c.text)
                self.metadatas.append(c.to_metadata())
            else:
                self.ids.append(ids[i] if ids else f"chunk_{i}")
                self.documents.append(str(c))
                self.metadatas.append({})
        emb = np.asarray(embeddings, np.float32)
        padded = _pad_rows(emb, self.block_size)
        self._build_device_arrays(padded)
        logger.info("Indexed %d vectors (dim=%d, format=%s)", self.n, self.dim, self.format)
        if self.persist_directory:
            self.save(self.persist_directory)

    def _build_device_arrays(self, padded: np.ndarray) -> None:
        if self.mesh is not None:
            from ..parallel.sharded_index import shard_corpus

            if self.format == "pq":
                # train codebooks host/replicated (small), shard the per-row
                # codes + int8 rescore codes across the mesh
                vecs = jnp.asarray(padded[: max(self.n, 1)], jnp.float32)
                m = min(self.pq_subspaces, self.dim)
                while self.dim % m != 0:
                    m -= 1
                coarse = self.pq_coarse_clusters
                if coarse == "auto":
                    coarse = min(2048, max(16, self.n // 8))
                self._rpq = train_residual_pq(
                    jax.random.PRNGKey(self.seed), vecs, m, self.pq_clusters,
                    int(coarse), self.pq_iters, self.pq_opq_iters,
                    aniso_eta=self._aniso_eta(),
                )
                self._pq_codebook = self._rpq.codebook
                cids, codes_pq = residual_pq_encode(
                    self._rpq, jnp.asarray(padded, jnp.float32),
                    self._aniso_eta())
                self._pq_coarse_ids, _ = shard_corpus(np.asarray(cids), self.mesh)
                self._pq_codes, _ = shard_corpus(np.asarray(codes_pq), self.mesh)
                if self.pq_rescore != "none":
                    arr = padded.astype(np.float32)
                    amax = np.max(np.abs(arr), axis=-1)
                    scales = np.maximum(amax, 1e-12) / 127.0
                    codes = np.clip(np.round(arr / scales[:, None]), -127, 127).astype(np.int8)
                    if self.pq_rescore == "host":
                        self._mirror_set(codes, scales.astype(np.float32))
                    else:
                        self._codes, _ = shard_corpus(codes, self.mesh)
                        self._scales, _ = shard_corpus(scales.astype(np.float32), self.mesh)
                self._pq_trained_n = self.n
                return
            if self.format == "int8":
                # quantize host-side, then shard codes + scales row-wise
                arr = padded.astype(np.float32)
                amax = np.max(np.abs(arr), axis=-1)
                scales = np.maximum(amax, 1e-12) / 127.0
                codes = np.clip(np.round(arr / scales[:, None]), -127, 127).astype(np.int8)
                self._codes, _ = shard_corpus(codes, self.mesh)
                self._scales, _ = shard_corpus(scales.astype(np.float32), self.mesh)
                return
            self._vectors, _ = shard_corpus(padded.astype(np.float32), self.mesh)
            if self.format == "bf16":
                self._vectors = self._vectors.astype(jnp.bfloat16)
            return
        if self.format == "fp32":
            self._vectors = jnp.asarray(padded, jnp.float32)
        elif self.format == "bf16":
            self._vectors = jnp.asarray(padded, jnp.bfloat16)
        elif self.format == "int8":
            codes, scales = scalar_quantize(jnp.asarray(padded, jnp.float32))
            self._codes, self._scales = codes, scales
        elif self.format == "pq":
            vecs = jnp.asarray(padded, jnp.float32)
            key = jax.random.PRNGKey(self.seed)
            valid = vecs[: self.n] if self.n > 0 else vecs
            # largest subspace count ≤ configured that divides the dim
            m = min(self.pq_subspaces, self.dim)
            while self.dim % m != 0:
                m -= 1
            if m != self.pq_subspaces:
                logger.info("pq_subspaces %d -> %d (must divide dim %d)",
                            self.pq_subspaces, m, self.dim)
            if self.pq_residual:
                coarse = self.pq_coarse_clusters
                if coarse == "auto":
                    coarse = min(2048, max(16, self.n // 8))
                self._rpq = train_residual_pq(
                    key, valid, m, self.pq_clusters, int(coarse),
                    self.pq_iters, self.pq_opq_iters,
                    aniso_eta=self._aniso_eta(),
                )
                self._pq_coarse_ids, self._pq_codes = residual_pq_encode(
                    self._rpq, vecs, self._aniso_eta())
                self._pq_codebook = self._rpq.codebook
            else:
                eta = self._aniso_eta()
                dirs = None
                if eta is not None:
                    dirs = valid / jnp.maximum(
                        jnp.linalg.norm(valid, axis=1, keepdims=True), 1e-12)
                self._pq_codebook = train_pq(
                    key, valid, m, self.pq_clusters, self.pq_iters,
                    dirs=dirs, aniso_eta=eta,
                )
                all_dirs = None
                if eta is not None:
                    all_dirs = vecs / jnp.maximum(
                        jnp.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
                self._pq_codes = pq_encode(self._pq_codebook, vecs, all_dirs, eta)
            # exact-ish rescore mirror per pq_rescore mode: "int8" keeps it
            # in HBM (4x smaller than fp32), "host" keeps it in host RAM so
            # HBM serves at M+2 bytes/vec, "none" skips it (pure ADC)
            if self.pq_rescore == "int8":
                codes, scales = scalar_quantize(vecs)
                self._codes, self._scales = codes, scales
            elif self.pq_rescore == "host":
                arr = padded.astype(np.float32)
                amax = np.max(np.abs(arr), axis=-1)
                s_np = np.maximum(amax, 1e-12) / 127.0
                self._mirror_set(
                    np.clip(np.round(arr / s_np[:, None]), -127, 127
                            ).astype(np.int8),
                    s_np.astype(np.float32))
            self._pq_trained_n = self.n  # drift baseline for incremental add

    # -- query -------------------------------------------------------------
    def search_batch(
        self,
        query_embeddings: np.ndarray,  # [B, D]
        top_k: int = 3,
        where: Optional[Dict[str, Any]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched top-k. Returns (scores [B, k] cosine sim, ids [B, k] int)."""
        if self.n == 0:
            b = query_embeddings.shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        q = jnp.asarray(query_embeddings, jnp.float32)
        k = min(top_k, self.n)
        if where:
            return self._masked_search(q, k, where)
        if self.format == "pq" and self.pq_rescore == "host":
            # search_batch_dev returns the ADC ranking for host mode (both
            # the mesh-sharded and single-device scans); rescore the top
            # cand_k candidates against the host-RAM int8 mirror
            cand_k = min(max(self.rescore_k, k), self.n)
            adc_s, cand = self.search_batch_dev(q, cand_k)
            return self._host_rescore(np.asarray(q), adc_s, cand, k)
        s, i = self.search_batch_dev(q, k)
        return np.asarray(s), np.asarray(i)

    def search_batch_dev(
        self, q: jax.Array, top_k: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Device-level batched search: no host sync — callers can pipeline
        further device work (candidate gather, MMR) before materializing."""
        k = min(top_k, self.n)
        if self.mesh is not None:
            from ..parallel.sharded_index import (
                sharded_topk, sharded_topk_int8, sharded_topk_residual_pq,
            )

            if self.format == "pq":
                # device-mirror modes rescore inside the shard bodies; the
                # host/none modes rank by ADC (host rescore happens in
                # search_batch, which is host-level by definition)
                mirror = (
                    (self._codes, self._scales)
                    if self.pq_rescore == "int8" else (None, None)
                )
                return sharded_topk_residual_pq(
                    self._rpq, self._residual_ext(), *mirror,
                    q, k, self.n, self.mesh,
                    rescore_k=max(self.rescore_k, k),
                    block_size=self.block_size,
                )
            if self.format == "int8":
                return sharded_topk_int8(
                    self._codes, self._scales, q, k, self.n, self.mesh,
                    rescore_k=max(self.rescore_k, k),
                    block_size=self.block_size,
                )
            return sharded_topk(
                self._vectors, q, k, self.n, self.mesh,
                block_size=self.block_size,
            )
        # Measured routing (round 2.6, TPU v5e): the fused Pallas kernel
        # wins at every batch size on real HW, and its per-block winner
        # count kb now defaults adaptively INSIDE the kernel (flat kb=4 for
        # large k measured a ~250 ms exactness-fallback tail when a single
        # block held >4 of one query's top-k — ops/pallas_scan._default_kb).
        # Small corpora always use the one-matmul XLA path.
        use_pallas = self._use_pallas()

        if self.format in ("fp32", "bf16"):
            if use_pallas and self._vectors.shape[0] >= 4 * self.block_size:
                s, i = pallas_topk(self._vectors, q, k, self.n, self.block_size)
            elif self._vectors.shape[0] > 65536:
                s, i = blockwise_topk(self._vectors, q, k, self.n)
            else:
                s, i = exact_topk(self._vectors, q, k, self.n)
        elif self.format == "int8":
            if use_pallas and self._codes.shape[0] >= 4 * self.block_size:
                cand_k = min(max(self.rescore_k, k), self.n)
                _, cand = pallas_topk_int8(
                    self._codes, self._scales, q, cand_k, self.n, self.block_size,
                )
                s, i = _rescore(self._codes, self._scales, q, cand, k, self.n)
            else:
                s, i = int8_topk(
                    self._codes, self._scales, q, k, self.n,
                    rescore_k=max(self.rescore_k, k),
                )
        else:  # pq: ADC scan for candidates, then the mode's rescore
            if self.pq_rescore == "int8":
                cand_k = min(max(self.rescore_k, k), self.n)
                _, cand = self._pq_adc_candidates(q, cand_k)
                s, i = _rescore(self._codes, self._scales, q, cand, k, self.n)
            else:
                # host/none: the device-level result is the ADC ranking
                # (exact w.r.t. the compressed codes); pq_rescore="host"
                # callers get the host-rescored ranking via search_batch
                s, i = self._pq_adc_candidates(q, k)
        return s, i

    def _pq_adc_candidates(
        self, q: jax.Array, cand_k: int, row_mask: jax.Array | None = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Device ADC scan over the compressed codes → (scores, ids) of the
        top ``cand_k`` rows, routed through the fused Pallas kernels above
        the ≥4·block_size threshold (single-device path)."""
        use_pallas = self._use_pallas()
        if self._rpq is not None:
            if (
                use_pallas
                and self._pq_codes.shape[0] >= 4 * self.block_size
                and self._rpq.coarse.shape[0] % 256 == 0
                and self._rpq.coarse.shape[0] <= 65536  # two-byte coarse id
            ):
                if self.pq_sorted:
                    res = self._sorted_adc_candidates(q, cand_k, row_mask)
                    if res is not None:
                        return res  # None = plan refused → unsorted kernel
                from ..ops.pallas_scan import pallas_topk_residual_pq_adc

                return pallas_topk_residual_pq_adc(
                    self._rpq.rotation, self._rpq.coarse,
                    self._rpq.codebook.centroids, self._residual_ext(),
                    q, cand_k, self.n, self.block_size, row_mask=row_mask,
                )
            return residual_pq_adc_topk(
                self._rpq, self._pq_coarse_ids, self._pq_codes, q, cand_k,
                self.n, row_mask=row_mask,
            )
        if use_pallas and self._pq_codes.shape[0] >= 4 * self.block_size:
            return pallas_topk_pq_adc(
                self._pq_codebook.centroids, self._pq_codes, q, cand_k,
                self.n, self.block_size, row_mask=row_mask,
            )
        return pq_adc_topk(
            self._pq_codebook, self._pq_codes, q, cand_k, self.n,
            row_mask=row_mask,
        )

    def _host_rescore(
        self, q_np: np.ndarray, adc_s, cand, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """pq_rescore="host": exact-ish rescore of device ADC candidates
        against the host-RAM int8 mirror — HBM holds only the M+2-byte codes
        while recall matches the device int8-rescore path (VERDICT r2 #2).
        Masked/padded candidates are excluded via their -inf ADC scores."""
        cand = np.asarray(cand)
        adc_s = np.asarray(adc_s)
        rows = np.clip(cand, 0, max(self.n - 1, 0))
        vecs = self._codes_host[rows].astype(np.float32) * \
            self._scales_host[rows][..., None]
        exact = np.einsum("bd,bcd->bc", q_np.astype(np.float32), vecs)
        exact = np.where(adc_s <= -1e29, -1e30, exact)
        k_eff = min(top_k, exact.shape[1])
        sel = np.argpartition(-exact, k_eff - 1, axis=1)[:, :k_eff]
        part = np.take_along_axis(exact, sel, axis=1)
        order = np.argsort(-part, axis=1)
        sel = np.take_along_axis(sel, order, axis=1)
        s = np.take_along_axis(exact, sel, axis=1)
        i = np.take_along_axis(cand, sel, axis=1)
        return s.astype(np.float32), i.astype(np.int32)

    def _use_pallas(self) -> bool:
        """Fused-kernel routing gate (the kernels themselves run interpret
        mode off-TPU, but the XLA paths are faster on CPU)."""
        return jax.default_backend() == "tpu"

    def _sorted_adc_candidates(
        self, q: jax.Array, cand_k: int, row_mask: jax.Array | None
    ) -> Optional[Tuple[jax.Array, jax.Array]]:
        """pq_sorted=True: route the residual-ADC scan through the sorted-
        coarse (IVF-window) kernel. Returns None when the window planner
        refuses this corpus/geometry (caller falls back to the unsorted
        kernel — same results, more coarse matmul work)."""
        from ..ops.pallas_scan import (
            adc_auto_group, pallas_topk_residual_pq_adc_sorted,
            plan_sorted_coarse_windows,
        )

        if self._pq_sorted_cache is None:
            from ..ops.pq import sort_codes_by_coarse

            ext = np.asarray(self._residual_ext())[: self.n]
            sorted_ext, perm, counts = sort_codes_by_coarse(
                ext, int(self._rpq.coarse.shape[0]))
            self._pq_sorted_cache = (
                jnp.asarray(sorted_ext), jnp.asarray(perm), counts)
            self._pq_wbase = {}
        ext_dev, perm_dev, counts = self._pq_sorted_cache
        group = adc_auto_group(
            self.n, q.shape[0], self.block_size, ext_dev.shape[1])
        if group not in self._pq_wbase:
            self._pq_wbase[group] = plan_sorted_coarse_windows(
                counts, self.n, self.block_size, group)
        wbase = self._pq_wbase[group]
        if wbase is None:
            return None
        mask_s = None
        if row_mask is not None:
            mask_s = row_mask[: self.n][perm_dev]
        s, i = pallas_topk_residual_pq_adc_sorted(
            self._rpq.rotation, self._rpq.coarse,
            self._rpq.codebook.centroids, ext_dev, jnp.asarray(wbase),
            q, cand_k, self.n, self.block_size, row_mask=mask_s, group=group,
        )
        # map sorted-row ids back to canonical ids on device
        return s, jnp.where(i >= 0, perm_dev[i], -1)

    def _residual_ext(self) -> jax.Array:
        """Cached [N, M+2] uint8 layout for the fused residual-PQ scan
        (coarse id hi/lo bytes + residual codes; ops.pq.residual_codes_ext).
        The cache is cleared by every index mutation (_clear/add/load)."""
        if self._pq_codes_ext is None:
            from ..ops.pq import residual_codes_ext

            self._pq_codes_ext = residual_codes_ext(self._pq_coarse_ids, self._pq_codes)
        return self._pq_codes_ext

    def gather_vectors_dev(self, rows: jax.Array) -> jax.Array:
        """Device-level dense-row gather (for MMR), no host sync."""
        rows = jnp.maximum(rows, 0)
        if self._vectors is not None:
            return self._vectors[rows].astype(jnp.float32)
        if self._codes is not None:
            return self._codes[rows].astype(jnp.float32) * self._scales[rows][..., None]
        return self._pq_reconstruct_rows(rows)

    def _pq_reconstruct_rows(self, rows: jax.Array) -> jax.Array:
        """Decode PQ codes for given rows back to fp32 (the pq_rescore=
        "host"/"none" stand-in for the dense gather: k·D work per query)."""
        codes = self._pq_codes[rows].astype(jnp.int32)  # [..., M]
        cents = self._pq_codebook.centroids  # [M, K, dsub]
        parts = [cents[mi][codes[..., mi]] for mi in range(cents.shape[0])]
        rec = jnp.concatenate(parts, axis=-1)
        if self._rpq is not None:  # rotated space: add coarse, rotate back
            rec = rec + self._rpq.coarse[self._pq_coarse_ids[rows]]
            rec = jnp.dot(rec, self._rpq.rotation.T,
                          preferred_element_type=jnp.float32)
        return rec

    def _md_column(self, key: str) -> Tuple[np.ndarray, np.ndarray]:
        """Typed per-key metadata column + missing mask, built ONCE per key
        (cached; auto-invalidated when the corpus length changes). Numeric
        and string columns get native numpy dtypes so the per-query compare
        is a vectorized C loop, not O(N) Python (VERDICT r2 weak #4)."""
        cached = self._md_cols.get(key)
        if cached is not None and cached[2] == len(self.metadatas):
            return cached[0], cached[1]
        vals = [md.get(key) for md in self.metadatas]  # one pass, amortized
        missing = np.fromiter(
            (v is None for v in vals), np.bool_, count=len(vals)
        )
        present = [v for v in vals if v is not None]
        if present and all(isinstance(v, (bool, int, float)) for v in present):
            col = np.fromiter(
                (0.0 if v is None else float(v) for v in vals),
                np.float64, count=len(vals),
            )
        elif present and all(isinstance(v, str) for v in present):
            col = np.array(["" if v is None else v for v in vals])
        else:  # mixed/exotic types: object compare (still a C-level loop)
            col = np.array(vals, dtype=object)
        self._md_cols[key] = (col, missing, len(self.metadatas))
        return col, missing

    def _row_mask(self, where: Dict[str, Any]) -> Tuple[np.ndarray, int]:
        """Host-built metadata row mask over the padded rows — vectorized
        numpy compares against cached typed columns; no per-query O(N)
        Python loop over metadata dicts."""
        n = len(self.metadatas)
        allowed = np.ones((n,), np.bool_)
        for key, val in where.items():
            col, missing = self._md_column(key)
            if val is None:
                eq = missing  # md.get(key) == None ↔ key absent or None
            elif col.dtype == object:
                eq = (col == val) & ~missing
            elif isinstance(val, (bool, int, float)) and col.dtype.kind == "f":
                eq = (col == float(val)) & ~missing
            elif isinstance(val, str) and col.dtype.kind in ("U", "S"):
                eq = (col == val) & ~missing
            else:  # type mismatch between query value and column: no rows
                eq = np.zeros((n,), np.bool_)
            allowed &= np.asarray(eq, np.bool_)
        mask = np.zeros((self._padded_rows(),), np.bool_)
        mask[:n] = allowed
        return mask, int(allowed.sum())

    def _masked_search(self, q: jax.Array, k: int, where: Dict[str, Any]):
        """Metadata-filtered search in the index's NATIVE format — int8/pq
        codes are never densified to fp32 (a 1.5 GB spike at 1M×384); the
        mask applies to the [B, N] score matrix inside the scan op."""
        mask_np, n_allowed = self._row_mask(where)
        k_eff = min(k, max(n_allowed, 1))
        mask = jnp.asarray(mask_np)
        pq_host = self.format == "pq" and self.pq_rescore == "host"
        cand_k = min(max(self.rescore_k, k_eff), self.n)
        if self.mesh is not None:
            # sharded stores: push the mask into the format-native sharded
            # scan (fp32 used to densify the whole corpus here — VERDICT r1
            # weak list; int8/pq never dequantize outside their rescore)
            from ..parallel.sharded_index import (
                sharded_topk, sharded_topk_int8, sharded_topk_residual_pq,
            )

            if self.format == "pq":
                mirror = (
                    (self._codes, self._scales)
                    if self.pq_rescore == "int8" else (None, None)
                )
                s, i = sharded_topk_residual_pq(
                    self._rpq, self._residual_ext(), *mirror,
                    q, cand_k if pq_host else k_eff, self.n, self.mesh,
                    rescore_k=cand_k, row_mask=mask,
                    block_size=self.block_size,
                )
                if pq_host:
                    return self._host_rescore(np.asarray(q), s, i, k_eff)
            elif self.format == "int8":
                s, i = sharded_topk_int8(
                    self._codes, self._scales, q, k_eff, self.n, self.mesh,
                    rescore_k=cand_k, row_mask=mask,
                    block_size=self.block_size,
                )
            else:
                s, i = sharded_topk(
                    self._vectors, q, k_eff, self.n, self.mesh, row_mask=mask,
                    block_size=self.block_size,
                )
        elif self.format in ("fp32", "bf16"):
            s, i = exact_topk(self._vectors, q, k_eff, self.n, row_mask=mask)
        elif self.format == "pq" and self.pq_rescore != "int8":
            # host/none modes: masked ADC over the compressed codes
            adc_s, cand = self._pq_adc_candidates(
                q, cand_k if pq_host else k_eff, row_mask=mask
            )
            if pq_host:
                return self._host_rescore(np.asarray(q), adc_s, cand, k_eff)
            s, i = adc_s, cand
        else:  # int8, and pq with the device int8 rescore mirror
            s, i = int8_topk(
                self._codes, self._scales, q, k_eff, self.n,
                rescore_k=cand_k, row_mask=mask,
            )
        return np.asarray(s), np.asarray(i, np.int32)

    def _dense_vectors(self) -> jax.Array:
        if self._vectors is not None:
            return self._vectors.astype(jnp.float32)
        if self._codes is not None:
            return self._codes.astype(jnp.float32) * self._scales[:, None]
        if self._codes_host is not None:
            return jnp.asarray(
                self._codes_host.astype(np.float32) * self._scales_host[:, None]
            )
        return self._pq_reconstruct_rows(jnp.arange(self._padded_rows()))

    def get_vectors(self, row_ids: np.ndarray) -> np.ndarray:
        """Dense fp32 embeddings for given row indices (dequantized if needed).

        Used by MMR: the index already holds every chunk's embedding, so
        diversity re-ranking needs no re-embedding (unlike reference
        ``rag/retrieval.py:237-239``).
        """
        if self._codes_host is not None and self._vectors is None:
            rows_np = np.asarray(row_ids, np.int64)
            return self._codes_host[rows_np].astype(np.float32) * \
                self._scales_host[rows_np][..., None]
        rows = jnp.asarray(np.asarray(row_ids, np.int32))
        if self._vectors is not None:
            return np.asarray(self._vectors[rows].astype(jnp.float32))
        if self._codes is not None:
            return np.asarray(
                self._codes[rows].astype(jnp.float32) * self._scales[rows][..., None]
            )
        return np.asarray(self._pq_reconstruct_rows(rows))

    def _padded_rows(self) -> int:
        for arr in (self._vectors, self._codes, self._pq_codes):
            if arr is not None:
                return arr.shape[0]
        return 0

    def add(self, chunks: Sequence[Any], embeddings: np.ndarray) -> None:
        """Incremental add (reference collection.add, indexing.py:114-119),
        o(N) amortized: new rows are written into the index's padding region
        via a jitted dynamic-slice update (donated buffer → in-place on
        device; one compile per (capacity, batch-bucket) shape pair, not per
        call), with capacity doubling when full. Only the NEW rows are
        quantized/encoded — no host materialization of the existing corpus.

        PQ: new rows are encoded against the existing codebook; the codebook
        is retrained (one O(N) rebuild) only when the corpus has doubled
        since the last training, bounding drift while keeping adds cheap.
        Mesh-sharded stores append in place too (round 3, VERDICT r2 weak
        #8): a GSPMD dynamic-update-slice with the corpus sharding pinned;
        only capacity doubling pays a device-side redistribute.
        """
        if self.n == 0:
            self.create_index(chunks, embeddings)
            return
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"embeddings must be [M, {self.dim}]")
        for i, c in enumerate(chunks):
            if hasattr(c, "text"):
                self.ids.append(c.chunk_id)
                self.documents.append(c.text)
                self.metadatas.append(c.to_metadata())
            else:
                self.ids.append(f"chunk_{len(self.ids)}")
                self.documents.append(str(c))
                self.metadatas.append({})
        new_n = self.n + emb.shape[0]
        if self.format == "pq" and new_n >= 2 * getattr(self, "_pq_trained_n", self.n):
            # drift bound: retrain codebooks once the corpus has doubled
            # (mesh included: codebook retraining is inherently O(N))
            self._rebuild_from_dense(
                np.concatenate([np.asarray(self._dense_vectors())[: self.n], emb])
            )
            return
        # pad the new block to a fixed row bucket so each (capacity, bucket)
        # pair compiles exactly once (remote compiles cost 20-40s on the
        # axon tunnel); the padding rows land in the index's padding region
        block = _pad_rows(emb, min(self.block_size, 128))
        # capacity must cover the PADDED block: dynamic_update_slice clamps
        # out-of-bounds starts, which would silently shift the write
        if self.n + block.shape[0] > self._padded_rows():
            self._grow(max(2 * self._padded_rows(), self.n + block.shape[0]))
        start = jnp.asarray(self.n, jnp.int32)
        upd = (_row_update if self.mesh is None
               else partial(_mesh_row_update, mesh=self.mesh))
        if self.format in ("fp32", "bf16"):
            self._vectors = upd(self._vectors, jnp.asarray(block), start)
        elif self.format == "int8":
            codes, scales = scalar_quantize(jnp.asarray(block, jnp.float32))
            self._codes = upd(self._codes, codes, start)
            self._scales = upd(self._scales, scales, start)
        else:  # pq: encode new rows with the EXISTING codebooks + int8 rescore codes
            eta = self._aniso_eta()
            if self._rpq is not None:
                new_cids, new_codes = residual_pq_encode(
                    self._rpq, jnp.asarray(block), eta)
                self._pq_coarse_ids = upd(self._pq_coarse_ids, new_cids, start)
            else:
                blk = jnp.asarray(block)
                bdirs = None
                if eta is not None:
                    bdirs = blk / jnp.maximum(
                        jnp.linalg.norm(blk, axis=1, keepdims=True), 1e-12)
                new_codes = pq_encode(self._pq_codebook, blk, bdirs, eta)
            self._pq_codes = upd(self._pq_codes, new_codes, start)
            self._pq_codes_ext = None  # fused-scan layout cache is now stale
            self._pq_sorted_cache = None
            self._pq_wbase = {}
            if self.pq_rescore == "int8":
                codes, scales = scalar_quantize(jnp.asarray(block, jnp.float32))
                self._codes = upd(self._codes, codes, start)
                self._scales = upd(self._scales, scales, start)
            elif self.pq_rescore == "host":
                arr = block.astype(np.float32)
                amax = np.max(np.abs(arr), axis=-1)
                s_np = np.maximum(amax, 1e-12) / 127.0
                c_np = np.clip(np.round(arr / s_np[:, None]), -127, 127).astype(np.int8)
                # the host mirror is padded independently of the device
                # arrays (create pads it to a block_size multiple, shards
                # pad to a device multiple), so size the grow off ITS OWN
                # length — _grow keys off _padded_rows() (device shape) and
                # may legitimately not fire here
                end = self.n + c_np.shape[0]
                self._mirror_grow(end)
                self._codes_host[self.n:end] = c_np
                self._scales_host[self.n:end] = s_np
        self.n = new_n
        logger.info("Index grown to %d vectors (in-place append)", self.n)
        if self.persist_directory:
            self.save(self.persist_directory)

    def _rebuild_from_dense(self, all_emb: np.ndarray) -> None:
        n = all_emb.shape[0]
        ids, docs, mds = self.ids, self.documents, self.metadatas
        self._clear()
        self.n, self.dim = n, int(all_emb.shape[1])
        self.ids, self.documents, self.metadatas = ids, docs, mds
        self._build_device_arrays(_pad_rows(all_emb, self.block_size))
        self._pq_trained_n = self.n
        logger.info("Index rebuilt at %d vectors", self.n)

    def _grow(self, new_capacity: int) -> None:
        """Double the padded device arrays (zeros in the new tail). Mesh
        stores redistribute device-side under the corpus sharding (one
        collective reshuffle per doubling — amortized o(1)/row)."""
        base = self.block_size
        if self.mesh is not None:
            base *= int(self.mesh.devices.size)  # keep shards even
        cap = -(-new_capacity // base) * base
        old = self._padded_rows()
        if cap <= old:
            return

        def grown(arr):
            if arr is None:
                return None
            if self.mesh is not None:
                return _mesh_grow(arr, cap, self.mesh)
            pad = jnp.zeros((cap - old,) + arr.shape[1:], arr.dtype)
            return jnp.concatenate([arr, pad], axis=0)

        self._vectors = grown(self._vectors)
        self._codes = grown(self._codes)
        self._scales = grown(self._scales)
        self._pq_codes = grown(self._pq_codes)
        self._pq_coarse_ids = grown(self._pq_coarse_ids)
        if self._codes_host is not None:
            self._mirror_grow(cap)

    def search(
        self,
        query_embedding: np.ndarray,  # [D] or [1, D]
        top_k: int = 3,
        where: Optional[Dict[str, Any]] = None,
        where_document: Optional[str] = None,
    ) -> Dict[str, List[List[Any]]]:
        """Single-query search with the reference's result envelope (:125-180).

        ``where_document`` filters hits whose text contains the substring
        (reference's ``where_document={"$contains": ...}`` behavior) —
        EXHAUSTIVE, like ChromaDB's: if the top candidates don't yield
        ``top_k`` matches the fetch widens geometrically until they do or
        the whole corpus has been considered (VERDICT r2 weak #5: the old
        fixed 4·top_k cap silently under-returned on heavy filters).
        """
        q = np.asarray(query_embedding, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        fetch = top_k if not where_document else min(max(4 * top_k, 16), max(self.n, 1))
        while True:
            scores, idxs = self.search_batch(q, top_k=fetch, where=where)
            rows = []
            enough = True
            for row_s, row_i in zip(scores, idxs):
                keep = [
                    (s, i) for s, i in zip(row_s, row_i)
                    if 0 <= i < self.n and s > -1e29
                ]
                if where_document:
                    matched = [
                        (s, i) for s, i in keep
                        if where_document in self.documents[i]
                    ]
                    # under-filled AND the scan wasn't exhaustive yet →
                    # widen (len(keep) < fetch means the corpus/filter ran
                    # out of valid rows — no point refetching)
                    if len(matched) < top_k and len(keep) == fetch and fetch < self.n:
                        enough = False
                        break
                    keep = matched
                rows.append(keep)
            if enough:
                break
            fetch = min(4 * fetch, self.n)
        out_ids, out_docs, out_md, out_dist, out_sim = [], [], [], [], []
        for keep in rows:
            keep = keep[:top_k]
            out_ids.append([self.ids[i] for _, i in keep])
            out_docs.append([self.documents[i] for _, i in keep])
            out_md.append([self.metadatas[i] for _, i in keep])
            out_sim.append([float(s) for s, _ in keep])
            out_dist.append([1.0 - float(s) for s, _ in keep])
        return {
            "ids": out_ids,
            "documents": out_docs,
            "metadatas": out_md,
            "similarities": out_sim,
            "distances": out_dist,
        }

    # -- management (reference :182-211) ------------------------------------
    def delete_collection(self) -> None:
        self._clear()

    def reset(self) -> None:
        self._clear()

    def get_stats(self) -> Dict[str, Any]:
        stats = {
            "num_vectors": self.n,
            "embedding_dim": self.dim,
            "format": self.format,
            "memory_bytes": self.memory_bytes(),
        }
        if self._codes_host is not None:
            # pq_rescore="host": the int8 rescore mirror lives in host RAM,
            # not HBM — report it separately so the M+2 B/vec HBM claim is
            # auditable from stats alone
            stats["host_mirror_bytes"] = int(
                self._codes_host.nbytes + self._scales_host.nbytes
            )
            # disk-backed mirror: the bytes above live in the page cache /
            # on disk, not resident RAM
            stats["host_mirror_mmap"] = bool(isinstance(
                self._codes_host, np.memmap))
        return stats

    def memory_bytes(self) -> int:
        total = 0
        for arr in (self._vectors, self._codes, self._scales, self._pq_codes,
                    self._pq_coarse_ids):
            if arr is not None:
                total += arr.size * arr.dtype.itemsize
        if self._pq_codebook is not None:
            c = self._pq_codebook.centroids
            total += c.size * c.dtype.itemsize
        if self._rpq is not None:
            for arr in (self._rpq.rotation, self._rpq.coarse):
                total += arr.size * arr.dtype.itemsize
        return total

    # -- persistence --------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        arrays: Dict[str, np.ndarray] = {}
        for name in ("_vectors", "_codes", "_scales", "_pq_codes", "_pq_coarse_ids"):
            arr = getattr(self, name)
            if arr is not None:
                arrays[name.lstrip("_")] = np.asarray(
                    arr.astype(jnp.float32) if arr.dtype == jnp.bfloat16 else arr
                )
        if self._pq_codebook is not None:
            arrays["pq_centroids"] = np.asarray(self._pq_codebook.centroids)
        if self._rpq is not None:
            arrays["pq_rotation"] = np.asarray(self._rpq.rotation)
            arrays["pq_coarse"] = np.asarray(self._rpq.coarse)
        mmap_meta = None
        if self._codes_host is not None:
            if self.pq_host_mmap:
                # the raw files ARE the persisted mirror — flush, reference
                # by path; a 38 GB mirror must not round-trip through npz
                self._codes_host.flush()
                self._scales_host.flush()
                mmap_meta = {
                    "dir": os.path.abspath(self.pq_host_mmap),
                    "rows": int(self._codes_host.shape[0]),
                    "cols": int(self._codes_host.shape[1]),
                }
            else:
                arrays["codes_host"] = self._codes_host
                arrays["scales_host"] = self._scales_host
        np.savez_compressed(os.path.join(directory, "index_arrays.npz"), **arrays)
        meta = {
            "n": self.n,
            "dim": self.dim,
            "format": self.format,
            "pq_rescore": self.pq_rescore,
            "pq_aniso_eta": self.pq_aniso_eta,
            "block_size": self.block_size,
            "ids": self.ids,
            "documents": self.documents,
            "metadatas": self.metadatas,
        }
        if mmap_meta:
            meta["host_mirror_mmap"] = mmap_meta
        with open(os.path.join(directory, "index_meta.json"), "w") as f:
            json.dump(meta, f)
        logger.info("Saved index (%d vectors) to %s", self.n, directory)

    def load(self, directory: str) -> None:
        with open(os.path.join(directory, "index_meta.json")) as f:
            meta = json.load(f)
        arrays = np.load(os.path.join(directory, "index_arrays.npz"))
        self.n = meta["n"]
        self.dim = meta["dim"]
        self.format = meta["format"]
        self.pq_rescore = meta.get("pq_rescore", self.pq_rescore)
        # η must roundtrip: incremental adds re-encode with the loaded
        # codebooks, and assignment must use the loss they were trained under
        self.pq_aniso_eta = meta.get("pq_aniso_eta", self.pq_aniso_eta)
        self.block_size = meta.get("block_size", self.block_size)
        self.ids = meta["ids"]
        self.documents = meta["documents"]
        self.metadatas = meta["metadatas"]
        self._vectors = self._codes = self._scales = None
        self._pq_codes = self._pq_codebook = None
        self._rpq = self._pq_coarse_ids = None
        self._pq_codes_ext = None
        self._pq_sorted_cache = None
        self._pq_wbase = {}
        self._md_cols = {}  # same-length reload must not serve stale columns
        self._codes_host = self._scales_host = None
        if "codes_host" in arrays:
            self._codes_host = arrays["codes_host"].astype(np.int8)
            self._scales_host = arrays["scales_host"].astype(np.float32)
        elif meta.get("host_mirror_mmap"):
            mm = meta["host_mirror_mmap"]
            self.pq_host_mmap = mm["dir"]
            self._codes_host = np.memmap(
                os.path.join(mm["dir"], self._MMAP_CODES), np.int8,
                mode="r+", shape=(mm["rows"], mm["cols"]))
            self._scales_host = np.memmap(
                os.path.join(mm["dir"], self._MMAP_SCALES), np.float32,
                mode="r+", shape=(mm["rows"],))
        if self.mesh is not None:
            # re-shard loaded arrays across the mesh
            from ..parallel.sharded_index import shard_corpus

            if "vectors" in arrays:
                self._vectors, _ = shard_corpus(arrays["vectors"].astype(np.float32), self.mesh)
                if self.format == "bf16":
                    self._vectors = self._vectors.astype(jnp.bfloat16)
            if "codes" in arrays and self.format in ("int8", "pq"):
                self._codes, _ = shard_corpus(arrays["codes"].astype(np.int8), self.mesh)
                self._scales, _ = shard_corpus(arrays["scales"].astype(np.float32), self.mesh)
            if self.format == "pq" and "pq_rotation" in arrays:
                self._pq_codebook = PQCodebook(jnp.asarray(arrays["pq_centroids"], jnp.float32))
                self._rpq = ResidualPQ(
                    rotation=jnp.asarray(arrays["pq_rotation"], jnp.float32),
                    coarse=jnp.asarray(arrays["pq_coarse"], jnp.float32),
                    codebook=self._pq_codebook,
                )
                # stored dtype (uint8 for K<=256): int32 would quadruple the
                # compressed corpus on device (ADVICE r2)
                self._pq_codes, _ = shard_corpus(arrays["pq_codes"], self.mesh)
                self._pq_coarse_ids, _ = shard_corpus(
                    arrays["pq_coarse_ids"].astype(np.int32), self.mesh
                )
                self._pq_trained_n = self.n
            logger.info("Loaded sharded index (%d vectors) from %s", self.n, directory)
            return
        if "vectors" in arrays:
            dtype = jnp.bfloat16 if self.format == "bf16" else jnp.float32
            self._vectors = jnp.asarray(arrays["vectors"], dtype)
        if "codes" in arrays:
            self._codes = jnp.asarray(arrays["codes"], jnp.int8)
            self._scales = jnp.asarray(arrays["scales"], jnp.float32)
        if "pq_codes" in arrays:
            self._pq_codes = jnp.asarray(arrays["pq_codes"])  # stored dtype (uint8)
            self._pq_codebook = PQCodebook(jnp.asarray(arrays["pq_centroids"], jnp.float32))
        if "pq_rotation" in arrays:
            self._rpq = ResidualPQ(
                rotation=jnp.asarray(arrays["pq_rotation"], jnp.float32),
                coarse=jnp.asarray(arrays["pq_coarse"], jnp.float32),
                codebook=self._pq_codebook,
            )
            self._pq_coarse_ids = jnp.asarray(arrays["pq_coarse_ids"], jnp.int32)
        self._pq_trained_n = self.n
        logger.info("Loaded index (%d vectors, %s) from %s", self.n, self.format, directory)


@partial(jax.jit, donate_argnums=0)
def _row_update(arr, block, start):
    """Write ``block`` rows at ``start`` (traced — no recompile per offset);
    the donated input buffer lets XLA update in place."""
    zeros = (0,) * (arr.ndim - 1)
    return jax.lax.dynamic_update_slice(arr, block.astype(arr.dtype), (start,) + zeros)


# per-(mesh, ndim) jitted updaters/growers for the sharded store (cached so
# streaming ingest compiles once per shape bucket, exactly like _row_update)
_MESH_UPDATERS: Dict[Any, Any] = {}
_MESH_GROWERS: Dict[Any, Any] = {}


def _mesh_row_update(arr, block, start, mesh):
    """In-place row append on a corpus-sharded array (VERDICT r2 weak #8):
    a GSPMD dynamic-update-slice with the row sharding pinned, donated so
    the per-shard buffers update in place — o(N) streaming ingest on a pod
    instead of the old full re-shard per batch."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    key = (mesh, arr.ndim)
    fn = _MESH_UPDATERS.get(key)
    if fn is None:
        spec = NamedSharding(mesh, P("corpus", *([None] * (arr.ndim - 1))))

        def upd(a, b, s):
            zeros = (0,) * (a.ndim - 1)
            out = jax.lax.dynamic_update_slice(
                a, b.astype(a.dtype), (s,) + zeros)
            return jax.lax.with_sharding_constraint(out, spec)

        fn = jax.jit(upd, donate_argnums=0)
        _MESH_UPDATERS[key] = fn
    return fn(arr, jnp.asarray(block), jnp.asarray(start, jnp.int32))


def _mesh_grow(arr, new_rows: int, mesh):
    """Capacity-double a corpus-sharded array (device-side redistribute —
    amortized o(1) per appended row, no host materialization)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    key = (mesh, arr.ndim)
    fn = _MESH_GROWERS.get(key)
    if fn is None:
        spec = NamedSharding(mesh, P("corpus", *([None] * (arr.ndim - 1))))

        def g(a, z):
            return jax.lax.with_sharding_constraint(
                jnp.concatenate([a, z], axis=0), spec)

        fn = jax.jit(g, donate_argnums=0)
        _MESH_GROWERS[key] = fn
    pad = jnp.zeros((new_rows - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return fn(arr, pad)


@partial(jax.jit, static_argnames=("k",))
def _rescore(codes, scales, queries, cand_ids, k, valid_n):
    """Exact-ish rescore of candidate ids against int8-dequantized vectors.

    Candidates at rows >= ``valid_n`` are padding (zero vectors that rescore
    to exactly 0.0 and would outrank real negatives) — mask them to -inf,
    mirroring the int8_topk path's padding mask.
    """
    cand_vecs = codes[cand_ids].astype(jnp.float32) * scales[cand_ids][..., None]
    exact = jnp.einsum("bd,bcd->bc", queries, cand_vecs, preferred_element_type=jnp.float32)
    exact = jnp.where(cand_ids < valid_n, exact, -1e30)
    s, sel = jax.lax.top_k(exact, min(k, cand_ids.shape[1]))
    return s, jnp.take_along_axis(cand_ids, sel, axis=1).astype(jnp.int32)
