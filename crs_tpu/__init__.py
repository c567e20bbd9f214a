"""crs_tpu — a TPU-native compressed-RAG and evaluation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``compressed-rag-suite`` reference (see SURVEY.md):

- ``crs_tpu.rag``        — document processing, chunking, embedding, the
  HBM-resident compressed vector index, retrieval (threshold / rerank / MMR),
  and LLM answer generation.
- ``crs_tpu.models``     — JAX model zoo: causal-LM transformer (prefill +
  KV-cache decode under jit), MiniLM-style encoder, weight-only quantization
  (int8 / int4), and the uniform ``ModelInterface``.
- ``crs_tpu.ops``        — Pallas TPU kernels and jitted compute primitives:
  fused blockwise top-k scans (fp32/bf16/int8), PQ (k-means + ADC), quantized
  matmuls, MMR.
- ``crs_tpu.parallel``   — device-mesh utilities and the ICI-sharded corpus
  scan (shard_map + allgather merge).
- ``crs_tpu.evaluation`` — efficiency / performance / retrieval benchmarks,
  statistics, and the analysis toolchain.
- ``crs_tpu.finetuning`` — LoRA finetuning with evaluation-in-the-loop.
"""

__version__ = "0.1.0"
