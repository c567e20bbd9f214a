#!/usr/bin/env python
"""Quickstart: the full workflow in ~40 lines.

    python examples/quickstart.py [path/to/document.pdf]

Indexes a document, asks a question with RAG, runs the retrieval benchmark,
and finetunes a LoRA adapter on a synthetic dataset — everything offline-
safe (deterministic-init models; swap in real checkpoints via model_path /
weights_path when available).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# honor JAX_PLATFORMS/JAX_PLATFORM_NAME: the image's sitecustomize re-pins
# jax.config to the axon TPU tunnel in every interpreter, which overrides
# the env var — so `JAX_PLATFORMS=cpu python quickstart.py` (the documented
# offline drive) must re-update the config here, before any device use
_plat = os.environ.get("JAX_PLATFORMS") or os.environ.get("JAX_PLATFORM_NAME")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from crs_tpu import ConfigLoader, EvaluationRunner, RAGPipeline, create_model_interface

DOC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/2308.07633v4-clean.pdf"

# 1. model (int8 weight-only quantized) + pipeline
cfg = ConfigLoader()  # built-in defaults; pass a path for your own config
cfg.update_config("rag.chunking.chunk_size", 160)
cfg.update_config("rag.vector_store.format", "int8")
cfg.update_config("rag.retrieval.similarity_threshold", 0.05)
model = create_model_interface("int8", {"config": "small"})
pipe = RAGPipeline(cfg.get_rag_config()).setup(model)

# 2. index + query
secs = pipe.index_documents(DOC)
print(f"indexed {pipe.store.n} chunks in {secs:.1f}s")
out = pipe.query("What is quantization-aware training?", return_chunks=True)
for c in out["chunks"]:
    print(f"  [{c['score']:.3f}] {c['text'][:80]}")
print("answer:", out["answer"][:120])

# 3. evaluate retrieval
runner = EvaluationRunner(
    model=model, pipeline=pipe,
    config={"retrieval": {"test_questions": [
        {"question": "What is post-training quantization?", "answer": "quantizing without retraining"},
    ], "compare_no_rag": False}},
    output_dir="/tmp/quickstart_results",
)
res = runner.run_retrieval_only()
print("retrieval metrics:", {k: v for k, v in (res.retrieval or {}).items()
                             if k in ("avg_retrieval_time_ms", "context_sufficiency")})

# 4. LoRA finetune on synthetic data
from crs_tpu.finetuning import QuantizedModelFinetuner
from crs_tpu.finetuning.code_generation import SyntheticCodeLoader

ft = QuantizedModelFinetuner(model, {"lora_rank": 4, "num_epochs": 1, "batch_size": 2,
                                     "max_seq_len": 64, "output_dir": "/tmp/quickstart_ft"})
train, _ = SyntheticCodeLoader({"num_samples": 8}).load()
result = ft.train(train, resume=False)
print(f"finetune: loss {result['history'][0]['loss']:.3f} after epoch 0")
