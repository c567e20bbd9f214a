#!/usr/bin/env python
"""Compressed serving demo: residual-PQ index at ~14 bytes/vector.

Builds a VectorStore in the `pq` format (coarse quantizer + OPQ-rotated
residual codebooks, optionally trained under the anisotropic score-aware
loss), then serves the same queries through the three `pq_rescore` modes:

  int8  — int8 rescore codes in HBM beside the PQ codes (default)
  host  — rescore mirror in host RAM; HBM holds only M+2 B/vec
  none  — rank by fused-ADC scores alone (pure compressed serving)

Run on CPU (~2 min):   python examples/pq_serving.py
On the chip, drop the jax_platforms line and raise N.

Reference parity: the compression pillar of the reference suite
(rag/indexing.py + its published compression results); here the index IS
the compressed object — there is no uncompressed copy anywhere on device
for the host/none modes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PQ_DEMO_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from crs_tpu.rag.index import VectorStore


def make_corpus(n=20_000, d=128, n_clusters=256, seed=0):
    """Clustered, anisotropic (correlated-dim) unit vectors — the regime
    real text embeddings live in and where plain PQ collapses."""
    rng = np.random.default_rng(seed)
    spec = np.exp(-np.arange(d) / 20.0)
    mix = rng.standard_normal((d, d)).astype(np.float32) * spec[None, :]
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) @ mix * 3.0
    x = centers[rng.integers(0, n_clusters, n)]
    x = x + rng.standard_normal((n, d)).astype(np.float32) @ mix
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main():
    n, d, topk = 20_000, 128, 10
    x = make_corpus(n, d)
    rng = np.random.default_rng(42)
    qi = rng.choice(n, 32, replace=False)
    q = x[qi] + 0.02 * rng.standard_normal((32, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(q @ x.T), axis=1)[:, :topk]

    for mode in ("int8", "host", "none"):
        store = VectorStore({
            "format": "pq",
            "pq_subspaces": 8,           # 8 residual bytes
            "pq_coarse_clusters": 512,   # + 2 coarse-id bytes = 10 B/vec
            "pq_aniso_eta": "auto",      # ScaNN score-aware loss
            "pq_iters": 10, "pq_opq_iters": 2,
            "pq_rescore": mode,
            "rescore_k": 100,
            "block_size": 512,
        })
        t0 = time.perf_counter()
        store.create_index([f"doc-{i}" for i in range(n)], x)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        scores, ids = store.search_batch(q, top_k=topk)
        search_ms = (time.perf_counter() - t0) * 1e3
        ids = np.asarray(ids)
        recall = np.mean([
            len(set(ids[i]) & set(exact[i])) / topk for i in range(len(q))
        ])
        stats = store.get_stats()
        mirror = stats.get("host_mirror_bytes", 0)
        print(f"pq_rescore={mode:5s}  recall@{topk}={recall:.3f}  "
              f"build={build_s:.1f}s  search={search_ms:.0f}ms/32q  "
              f"device={stats['memory_bytes'] / n:.1f} B/vec"
              + (f"  host_mirror={mirror / n:.1f} B/vec" if mirror else ""))


if __name__ == "__main__":
    main()
