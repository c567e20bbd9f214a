"""Batched text embedding on TPU.

Replaces the reference's sentence-transformers wrapper
(``rag/embedding.py:14-87``) with two JAX backends behind one interface:

- ``minilm`` — the 6-layer BERT encoder from ``crs_tpu.models.minilm`` run as
  a jitted forward, batched with length bucketing so each (batch, seq) shape
  compiles once. Uses a real WordPiece vocab + converted HF weights when a
  checkpoint directory is supplied; otherwise a deterministic random init +
  hash tokenizer (zero-egress fallback).
- ``hashed`` — a vocabulary-free lexical encoder: word uni/bi-gram feature
  hashing into a sparse count vector, sublinear tf weighting, then a fixed
  Gaussian random projection to the target dim (a matmul on the MXU),
  L2-normalized. Fully deterministic, no trained artifacts, and retrieval
  quality on lexical-overlap corpora is strong — this is the default engine
  for the bundled-corpus benchmarks.

Both return L2-normalized ``np.ndarray [N, dim]`` float32, matching the
reference contract (``embed(texts) -> np.ndarray``, reference :47-73).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.minilm import MiniLMConfig, MiniLMEncoder, load_hf_bert_params
from ..models.tokenizer import HashTokenizer, WordPieceTokenizer

logger = logging.getLogger(__name__)

__all__ = ["EmbeddingModel", "HashedEncoder"]

_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket_len(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class HashedEncoder:
    """Feature-hashing + fixed random projection sentence encoder."""

    # nnz-per-text buckets: each (B, K) shape compiles once
    _NNZ_BUCKETS = (64, 128, 256, 512, 1024)

    def __init__(self, dim: int = 384, num_features: int = 32768, seed: int = 0):
        self.dim = dim
        self.num_features = num_features
        # Fixed Gaussian projection, generated host-side (a jax.random call
        # would be one more remote compile on the tunnel); scaled so
        # projected vectors are O(1).
        rng = np.random.default_rng(seed)
        self._proj = jnp.asarray(
            rng.standard_normal((num_features, dim)).astype(np.float32) / np.sqrt(dim)
        )

        @jax.jit
        def project_sparse(idx: jax.Array, w: jax.Array) -> jax.Array:
            # emb[b] = Σ_k w[b,k] · proj[idx[b,k]] — equivalent to the dense
            # feats @ proj matmul but transfers ~1MB of (idx, weight) pairs
            # instead of a dense [B, 32768] matrix (67MB/batch, which at the
            # tunnel's ~100MB/s transfer rate dominated serving latency).
            rows = self._proj[idx]  # [B, K, D]
            out = jnp.einsum("bk,bkd->bd", w, rows, preferred_element_type=jnp.float32)
            return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)

        self._project_sparse = project_sparse

    def _feature_ids(self, text: str) -> Dict[int, float]:
        from .hashed_features import featurize

        return featurize(text, self.num_features)

    def encode_dev(self, texts: Sequence[str], pad_to: int = 0) -> jax.Array:
        """Encode texts → device array [len(texts), dim], no host sync.

        ``pad_to`` pads the batch dim so every call through a given batch
        size compiles exactly once (each new shape costs a 20–40s remote
        compile on the axon tunnel). Featurization runs through the native
        C++ hot path when available (crs_tpu.rag.hashed_features), with an
        identical-output Python fallback.
        """
        from .hashed_features import featurize_batch

        b = max(len(texts), 1)
        rows = max(pad_to, b)
        indices, weights, offsets = featurize_batch(texts, self.num_features) if texts else (
            np.zeros(0, np.int64), np.zeros(0, np.float32), np.zeros(rows + 1, np.int64)
        )
        nnz = int(np.max(offsets[1:] - offsets[:-1])) if len(offsets) > 1 else 1
        k = next((bk for bk in self._NNZ_BUCKETS if nnz <= bk), self._NNZ_BUCKETS[-1])
        idx = np.zeros((rows, k), np.int32)
        w = np.zeros((rows, k), np.float32)
        for row in range(len(texts)):
            lo, hi = int(offsets[row]), int(offsets[row + 1])
            n = min(hi - lo, k)
            idx[row, :n] = indices[lo : lo + n]
            w[row, :n] = weights[lo : lo + n]
        return self._project_sparse(jnp.asarray(idx), jnp.asarray(w))[: len(texts)]

    def encode(self, texts: Sequence[str], pad_to: int = 0) -> np.ndarray:
        return np.asarray(self.encode_dev(texts, pad_to))


class EmbeddingModel:
    """Config-driven embedding front end with batching (reference :14-87)."""

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        config = config or {}
        self.backend = config.get("backend", "minilm")
        self.batch_size = int(config.get("batch_size", 32))
        self.normalize = bool(config.get("normalize", True))
        self.max_length = int(config.get("max_length", 256))
        self.embedding_dim = int(config.get("embedding_dim", 384))
        seed = int(config.get("seed", 0))
        weights_path = config.get("weights_path") or os.environ.get("CRS_TPU_MINILM_WEIGHTS")

        if self.backend == "hashed":
            self._hashed = HashedEncoder(dim=self.embedding_dim, seed=seed)
            self.tokenizer = None
            self.encoder = None
        elif self.backend == "minilm":
            cfg = MiniLMConfig(hidden_size=self.embedding_dim) if self.embedding_dim != 384 else MiniLMConfig()
            params = None
            self.tokenizer: Any = None
            if weights_path and os.path.isdir(weights_path):
                params, self.tokenizer = _load_local_checkpoint(weights_path, cfg)
            if self.tokenizer is None:
                self.tokenizer = HashTokenizer(vocab_size=cfg.vocab_size)
            self.encoder = MiniLMEncoder(cfg, params=params, seed=seed)
            self._hashed = None
        else:
            raise ValueError(f"unknown embedding backend: {self.backend}")
        logger.info("EmbeddingModel backend=%s dim=%d", self.backend, self.embedding_dim)

    # -- public API (reference embed :47-73, embed_chunks :75-87) ----------
    def embed(self, texts: Sequence[str], as_numpy: bool = True):
        """Embed texts → [N, dim] L2-normalized.

        ``as_numpy=False`` (hashed backend) returns the device array without
        a host sync, letting callers pipeline the scan behind it — host↔
        device round trips dominate small-batch serving latency on the
        tunnel.
        """
        if isinstance(texts, str):
            texts = [texts]
        if not texts:
            return np.zeros((0, self.embedding_dim), np.float32)
        if self.backend == "hashed":
            # One padded projection per ≤512 texts (a device call per
            # sub-batch costs ~50ms dispatch on the tunnel).
            outs = []
            for i in range(0, len(texts), 512):
                group = texts[i : i + 512]
                pad = _bucket_len(max(len(group), 8)) if len(group) < 512 else 512
                outs.append(self._hashed.encode_dev(group, pad_to=max(pad, self.batch_size)))
            dev = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            return np.asarray(dev) if as_numpy else dev
        return self._embed_minilm(texts)

    def embed_chunks(self, chunks: Sequence[Any]) -> np.ndarray:
        return self.embed([c.text if hasattr(c, "text") else str(c) for c in chunks])

    def embed_query(self, query: str) -> np.ndarray:
        return self.embed([query])[0]

    # -- minilm batching ----------------------------------------------------
    def _embed_minilm(self, texts: Sequence[str]) -> np.ndarray:
        encoded = [self.tokenizer.encode(t, max_length=self.max_length) for t in texts]
        out = np.zeros((len(texts), self.embedding_dim), np.float32)
        # Sort by length to minimize padding waste, keep original order.
        # Batch dim is ALWAYS padded to batch_size so each (batch, seq-bucket)
        # shape compiles exactly once (remote compiles cost 20-40s each).
        order = sorted(range(len(texts)), key=lambda i: len(encoded[i]))
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            blen = _bucket_len(max(len(encoded[i]) for i in idx))
            ids = np.zeros((self.batch_size, blen), np.int32)
            mask = np.zeros((self.batch_size, blen), np.bool_)
            for row, i in enumerate(idx):
                seq = encoded[i][:blen]
                ids[row, : len(seq)] = seq
                mask[row, : len(seq)] = True
            emb = np.asarray(self.encoder.encode_ids(ids, mask))
            out[idx] = emb[: len(idx)]
        return out

    def get_stats(self) -> Dict[str, Any]:
        return {
            "backend": self.backend,
            "embedding_dim": self.embedding_dim,
            "batch_size": self.batch_size,
            "normalize": self.normalize,
        }


def _load_local_checkpoint(path: str, cfg: MiniLMConfig):
    """Load (params, tokenizer) from a local HF-format checkpoint dir."""
    state = None
    st_path = os.path.join(path, "model.safetensors")
    bin_path = os.path.join(path, "pytorch_model.bin")
    try:
        if os.path.exists(st_path):
            from safetensors.numpy import load_file  # type: ignore

            state = load_file(st_path)
        elif os.path.exists(bin_path):
            import torch  # type: ignore

            sd = torch.load(bin_path, map_location="cpu", weights_only=True)
            state = {k: v.numpy() for k, v in sd.items()}
    except Exception as e:  # pragma: no cover - environment dependent
        logger.warning("failed to load checkpoint %s: %s", path, e)
    params = None
    if state is not None:
        try:
            params = load_hf_bert_params(state, cfg)
        except KeyError as e:
            logger.warning(
                "checkpoint at %s does not match the MiniLM config (missing %s); "
                "falling back to deterministic init", path, e,
            )
    tokenizer = None
    vocab_path = os.path.join(path, "vocab.txt")
    if os.path.exists(vocab_path):
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path)
    return params, tokenizer
