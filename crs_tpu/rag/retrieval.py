"""Context retrieval: threshold filtering, hybrid rerank, MMR diversity.

Parity with the reference's ``ContextRetriever`` (``rag/retrieval.py:13-277``):

- config: ``top_k`` 3, ``similarity_threshold`` 0.3, ``rerank`` flag,
  ``diversity_penalty`` (:36-39),
- over-fetch 2k candidates when reranking (:119),
- threshold filter on similarity (:143),
- rerank = 0.7·semantic + 0.3·query-token-overlap (:190-217),
- MMR with λ = 1 − diversity_penalty, greedy
  ``λ·rel − (1−λ)·max_sim_to_selected`` (:219-277) — here on device using the
  embeddings the index already holds (no re-embedding pass).

Because our store returns cosine similarities directly, the reference's
per-metric distance→similarity conversions (:55-91) are provided as a
standalone helper for reading external stores.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..ops.mmr import mmr_select
from .embedding import EmbeddingModel
from .index import VectorStore

logger = logging.getLogger(__name__)

__all__ = ["ContextRetriever", "distance_to_similarity"]


def distance_to_similarity(distance: float, metric: str = "cosine") -> float:
    """Reference ``_distance_to_similarity`` (:55-91) for external stores:

    cosine: ChromaDB returns squared L2 of normalized vectors → 1 − d²/2;
    l2: 1/(1+d); ip: affine map of the (negated) inner product.
    """
    if metric == "cosine":
        return 1.0 - distance * distance / 2.0
    if metric == "l2":
        return 1.0 / (1.0 + distance)
    if metric == "ip":
        return (2.0 - distance) / 2.0
    raise ValueError(f"unknown metric: {metric}")


def _tokenize(text: str) -> set:
    return set(re.findall(r"[a-z0-9]+", text.lower()))


class ContextRetriever:
    def __init__(
        self,
        vector_store: VectorStore,
        embedding_model: EmbeddingModel,
        config: Optional[Dict[str, Any]] = None,
    ):
        config = config or {}
        self.store = vector_store
        self.embedder = embedding_model
        self.top_k = int(config.get("top_k", 3))
        self.similarity_threshold = float(config.get("similarity_threshold", 0.3))
        self.rerank = bool(config.get("rerank", True))
        self.diversity_penalty = float(config.get("diversity_penalty", 0.1))
        self.rerank_semantic_weight = float(config.get("rerank_semantic_weight", 0.7))

    # -- single query ------------------------------------------------------
    def retrieve(self, query: str, top_k: Optional[int] = None) -> List[Dict[str, Any]]:
        return self.retrieve_batch([query], top_k=top_k)[0]

    # -- batch (the TPU-native serving shape) ------------------------------
    def retrieve_batch(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ) -> List[List[Dict[str, Any]]]:
        k = top_k or self.top_k
        if self.store.n == 0:
            return [[] for _ in queries]
        use_mmr = self.diversity_penalty > 0
        fetch_k = min(2 * k if (self.rerank or use_mmr) else k, self.store.n)
        q_emb = self.embedder.embed(list(queries))
        scores, row_ids = self.store.search_batch(q_emb, top_k=fetch_k)
        results: List[List[Dict[str, Any]]] = []
        for qi, query in enumerate(queries):
            results.append(
                self._postprocess(query, q_emb[qi], scores[qi], row_ids[qi], k)
            )
        return results

    def _postprocess(
        self,
        query: str,
        q_emb: np.ndarray,
        scores: np.ndarray,
        row_ids: np.ndarray,
        k: int,
    ) -> List[Dict[str, Any]]:
        # threshold filter (reference :143)
        keep = [
            (float(s), int(r))
            for s, r in zip(scores, row_ids)
            if r >= 0 and s >= self.similarity_threshold
        ]
        if not keep:
            return []
        sims = np.array([s for s, _ in keep], np.float32)
        rows = np.array([r for _, r in keep], np.int32)

        # hybrid rerank (reference :190-217)
        ranked = sims.copy()
        if self.rerank:
            q_tokens = _tokenize(query)
            w = self.rerank_semantic_weight
            overlaps = np.array(
                [
                    (len(q_tokens & _tokenize(self.store.documents[r])) / len(q_tokens))
                    if q_tokens
                    else 0.0
                    for r in rows
                ],
                np.float32,
            )
            ranked = w * sims + (1.0 - w) * overlaps
            order = np.argsort(-ranked)
            sims, rows, ranked = sims[order], rows[order], ranked[order]

        # MMR diversity (reference :219-277), on device
        if self.diversity_penalty > 0 and len(rows) > k:
            emb = self.store.get_vectors(rows)
            lam = 1.0 - self.diversity_penalty
            picks = np.asarray(mmr_select(emb, ranked, k, lam))
            # scan may repeat when k > candidates; preserve order, dedupe
            seen, sel = set(), []
            for p in picks:
                if p not in seen:
                    seen.add(int(p))
                    sel.append(int(p))
            sims, rows, ranked = sims[sel], rows[sel], ranked[sel]

        out = []
        for s, rank_s, r in list(zip(sims, ranked, rows))[:k]:
            out.append(
                {
                    "id": self.store.ids[r],
                    "text": self.store.documents[r],
                    "metadata": self.store.metadatas[r],
                    "score": float(s),
                    "rank_score": float(rank_s),
                }
            )
        return out

    # -- context assembly (reference get_context_string :166) ---------------
    def get_context_string(
        self, query: str, top_k: Optional[int] = None, separator: str = "\n\n"
    ) -> str:
        return separator.join(c["text"] for c in self.retrieve(query, top_k))

    @staticmethod
    def context_from_results(results: List[Dict[str, Any]], separator: str = "\n\n") -> str:
        return separator.join(c["text"] for c in results)
