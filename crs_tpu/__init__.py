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


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (opt out via env).

    On the axon TPU tunnel every new program shape costs a 20-40s remote
    compile; the persistent cache makes repeated processes (bench runs,
    CLI invocations) reuse compiled executables across restarts.
    """
    import os

    if os.environ.get("CRS_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # Per-platform cache dirs: sharing one dir lets XLA:CPU load AOT
        # entries produced under the TPU terminal's compile env (machine-
        # feature mismatch warnings, potential SIGILL).
        tag = (os.environ.get("JAX_PLATFORM_NAME") or os.environ.get("JAX_PLATFORMS") or "default").split(",")[0]
        if tag == "cpu":
            # XLA:CPU AOT reload warns about pseudo machine features and can
            # in principle SIGILL; CPU compiles are cheap — cache only helps
            # the remote-compile TPU tunnel.
            return
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", f"/tmp/crs_tpu_jax_cache_{tag}"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules on
    bare ``import crs_tpu``)."""
    lazy = {
        "RAGPipeline": ("crs_tpu.rag.pipeline", "RAGPipeline"),
        "VectorStore": ("crs_tpu.rag.index", "VectorStore"),
        "ContextRetriever": ("crs_tpu.rag.retrieval", "ContextRetriever"),
        "EmbeddingModel": ("crs_tpu.rag.embedding", "EmbeddingModel"),
        "create_model_interface": ("crs_tpu.models.model_interface", "create_model_interface"),
        "EvaluationRunner": ("crs_tpu.evaluation.runner", "EvaluationRunner"),
        "ConfigLoader": ("crs_tpu.utils.config", "ConfigLoader"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'crs_tpu' has no attribute {name!r}")
