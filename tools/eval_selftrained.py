#!/usr/bin/env python
"""Quality columns on the self-trained generator (VERDICT r4 next #2/#4).

Runs the full evaluation suite (efficiency + performance + retrieval) on the
corpus-trained LM produced by tools/selftrain_lm.py, once per quantization
variant — the reference's quant-method comparison design
(`/root/reference/results/mistral_{fp16,nf4,gptq,awq}/`) reproduced on the
in-image model. Honesty guards:

- RAG answer quality is measured on the 10 HELD-OUT questions (the split
  saved by selftrain_lm in selftrain_result.json) — never the 31 the model
  was instruct-tuned on. The reference also evaluated 10 questions.
- Perplexity is measured on the held-out tail of the corpus (written to a
  local text file and plugged into the evaluator's local-file source), not
  the training text.

Usage: python tools/eval_selftrained.py [--ckpt DIR] [--variants bf16,int8,...]
       [--out results/selftrained] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QA = Path("/root/reference/data/2308.07633v4-qa.json")

VARIANTS = {
    "bf16": {"type": "jax", "quantization": None},
    "int8": {"type": "int8", "quantization": "int8"},
    "int4": {"type": "int4", "quantization": "int4"},
    "nf4": {"type": "nf4", "quantization": "nf4"},
    "gptq": {"type": "gptq", "quantization": "gptq4"},
    "awq": {"type": "awq", "quantization": "awq4"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=str(REPO / "checkpoints" / "selftrained_small"))
    ap.add_argument("--variants", default="bf16,int8,int4,nf4,gptq,awq")
    ap.add_argument("--out", default=str(REPO / "results" / "selftrained"))
    ap.add_argument("--holdout-frac", type=float, default=0.08,
                    help="must match the selftrain run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    meta = json.loads((Path(args.ckpt) / "selftrain_result.json").read_text())
    eval_idx = set(meta["qa_eval_indices"])

    # -- held-out QA file -------------------------------------------------------
    items = json.loads(QA.read_text())
    held_qa = [items[i] for i in sorted(eval_idx)]
    qa_path = Path(args.out) / "heldout_qa.json"
    qa_path.parent.mkdir(parents=True, exist_ok=True)
    qa_path.write_text(json.dumps(held_qa, indent=2))

    # -- held-out perplexity text ------------------------------------------------
    sys.path.insert(0, str(REPO))
    from tools.selftrain_lm import build_text

    text = build_text()
    cut = int(len(text) * (1.0 - args.holdout_frac))
    held_txt = Path(args.out) / "heldout_corpus.txt"
    held_txt.write_text(text[cut:])

    from crs_tpu.utils.config import ConfigLoader

    base = ConfigLoader(str(REPO / "config.json")).config

    summary = {}
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        t0 = time.perf_counter()
        cfg = json.loads(json.dumps(base))  # deep copy
        cfg["model"].update({
            "model_path": args.ckpt,
            "type": spec["type"],
            "quantization": spec["quantization"],
            "max_seq_len": 2048,
        })
        # match the training context budget (byte-level model, seq 1536)
        cfg["rag"]["generation"]["max_context_chars"] = 1200
        cfg["rag"]["generation"]["max_new_tokens"] = 96
        p = cfg["evaluation"]["performance"]["perplexity"]
        p["dataset_path"] = str(held_txt)  # local-file source (held-out tail)
        p["max_samples"] = 24
        p["max_length"] = 1024
        cfg["evaluation"]["retrieval"]["test_questions_file"] = str(qa_path)
        cfg["evaluation"]["retrieval"]["save_detailed_responses"] = True
        cfg_path = Path(args.out) / f"config_{name}.json"
        cfg_path.write_text(json.dumps(cfg, indent=2))

        out_dir = Path(args.out) / name
        print(f"== {name}: evaluating into {out_dir}", flush=True)
        import main as cli

        rc = cli.main([
            "--config", str(cfg_path), "--evaluate",
            "--output-dir", str(out_dir),
        ])
        dt = time.perf_counter() - t0
        row = {"rc": rc, "seconds": round(dt, 1)}
        comp = out_dir / "comprehensive_results.json"
        if comp.exists():
            doc = json.loads(comp.read_text())
            perf = doc.get("performance") or {}
            retr = doc.get("retrieval") or {}
            eff = doc.get("efficiency") or {}
            row.update({
                "perplexity": perf.get("perplexity"),
                "f1_score": retr.get("f1_score"),
                "exact_match": retr.get("exact_match"),
                "faithfulness": retr.get("faithfulness"),
                "f1_improvement": retr.get("f1_improvement"),
                "context_sufficiency": retr.get("context_sufficiency"),
                "latency_ms_per_token": eff.get("latency_ms_per_token"),
                "model_size_gb": eff.get("model_size_gb"),
            })
        summary[name] = row
        print(json.dumps({name: row}), flush=True)
        (Path(args.out) / "summary.json").write_text(json.dumps(summary, indent=2))

    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
