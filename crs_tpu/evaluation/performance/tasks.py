"""Task registry + native multiple-choice evaluation.

Parity with the reference's lm-eval integration
(``performance/lm_eval_wrapper.py``): the 23-task ``TASK_REGISTRY`` with
metric / default-fewshot / category metadata (:9-169), presets
(``lm_eval_utils.py:107-142``), and config validation (:194-244).

Execution is two-tier:
- when the ``lm_eval`` package AND its datasets are available, tasks run
  through the harness via the :class:`JaxLM` adapter
  (``lm_eval_adapter.py``),
- otherwise, any task whose data is supplied locally (config
  ``dataset_path`` with ``{query, choices, gold}`` items) — or the bundled
  ``corpus_qa_mc`` task auto-built from the QA corpus — is scored natively
  with the same mechanism lm-eval uses: per-choice log-likelihood ranking
  via ``ModelInterface.get_loglikelihood``.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)

__all__ = ["TASK_REGISTRY", "PRESETS", "MultipleChoiceTask", "build_corpus_qa_task", "validate_task_config"]

# name → {metric, num_fewshot, category} (reference lm_eval_wrapper.py:9-169)
TASK_REGISTRY: Dict[str, Dict[str, Any]] = {
    "hellaswag": {"metric": "acc_norm", "num_fewshot": 0, "category": "commonsense"},
    "arc_easy": {"metric": "acc_norm", "num_fewshot": 0, "category": "commonsense"},
    "arc_challenge": {"metric": "acc_norm", "num_fewshot": 0, "category": "commonsense"},
    "winogrande": {"metric": "acc", "num_fewshot": 0, "category": "commonsense"},
    "piqa": {"metric": "acc_norm", "num_fewshot": 0, "category": "commonsense"},
    "openbookqa": {"metric": "acc_norm", "num_fewshot": 0, "category": "commonsense"},
    "boolq": {"metric": "acc", "num_fewshot": 0, "category": "knowledge"},
    "mmlu": {"metric": "acc", "num_fewshot": 5, "category": "knowledge"},
    "triviaqa": {"metric": "exact_match", "num_fewshot": 5, "category": "knowledge"},
    "nq_open": {"metric": "exact_match", "num_fewshot": 5, "category": "knowledge"},
    "truthfulqa_mc2": {"metric": "acc", "num_fewshot": 0, "category": "knowledge"},
    "gsm8k": {"metric": "exact_match", "num_fewshot": 5, "category": "math"},
    "math_qa": {"metric": "acc_norm", "num_fewshot": 0, "category": "math"},
    "arithmetic": {"metric": "acc", "num_fewshot": 0, "category": "math"},
    "minerva_math": {"metric": "exact_match", "num_fewshot": 4, "category": "math"},
    "humaneval": {"metric": "pass@1", "num_fewshot": 0, "category": "code"},
    "mbpp": {"metric": "pass@1", "num_fewshot": 3, "category": "code"},
    "lambada_openai": {"metric": "acc", "num_fewshot": 0, "category": "language"},
    "wikitext": {"metric": "word_perplexity", "num_fewshot": 0, "category": "language"},
    "anli": {"metric": "acc", "num_fewshot": 0, "category": "reasoning"},
    "logiqa": {"metric": "acc_norm", "num_fewshot": 0, "category": "reasoning"},
    "sciq": {"metric": "acc_norm", "num_fewshot": 0, "category": "reasoning"},
    "corpus_qa_mc": {"metric": "acc", "num_fewshot": 0, "category": "retrieval", "local": True},
}

# Reference lm_eval_utils presets (:107-142)
PRESETS: Dict[str, List[str]] = {
    "baseline": ["hellaswag", "arc_easy", "arc_challenge", "humaneval"],
    "standard": ["hellaswag", "arc_easy", "arc_challenge", "winogrande", "piqa", "boolq"],
    "comprehensive": [
        "hellaswag", "arc_easy", "arc_challenge", "winogrande", "piqa", "boolq",
        "mmlu", "gsm8k", "humaneval", "truthfulqa_mc2",
    ],
    "reasoning": ["anli", "logiqa", "sciq"],
    "knowledge": ["boolq", "mmlu", "triviaqa", "nq_open"],
    "math_code": ["gsm8k", "math_qa", "humaneval", "mbpp"],
    "quick_test": ["arc_easy", "corpus_qa_mc"],
    "offline": ["corpus_qa_mc"],
}


def validate_task_config(tasks_cfg: Dict[str, Any]) -> List[str]:
    """Warn-and-filter unknown tasks (reference lm_eval_utils:194-244)."""
    valid = []
    for name, cfg in tasks_cfg.items():
        if name not in TASK_REGISTRY:
            logger.warning("unknown task %r — skipping", name)
            continue
        if isinstance(cfg, dict) and not cfg.get("enabled", True):
            continue
        valid.append(name)
    return valid


class MultipleChoiceTask:
    """Native loglikelihood-ranking evaluation (the lm-eval MC mechanism)."""

    def __init__(self, name: str, items: Sequence[Dict[str, Any]], metric: str = "acc"):
        self.name = name
        self.items = list(items)
        self.metric = metric

    @classmethod
    def from_file(cls, name: str, path: str, metric: str = "acc") -> "MultipleChoiceTask":
        with open(path) as f:
            items = json.load(f)
        return cls(name, items, metric)

    def evaluate(
        self, model, limit: Optional[int] = None, num_fewshot: int = 0
    ) -> Dict[str, Any]:
        items = self.items[: int(limit)] if limit else self.items
        if not items:
            return {"task": self.name, "metric": self.metric, "score": None, "num_items": 0}
        # few-shot prefix from held-out trailing items (lm-eval convention:
        # exemplars show the correct answer)
        prefix = ""
        if num_fewshot > 0:
            pool = [it for it in self.items if it not in items][:num_fewshot]
            if len(pool) < num_fewshot:
                pool = self.items[-num_fewshot:]
            prefix = "\n\n".join(
                f"{ex['query']} {ex['choices'][int(ex['gold'])]}" for ex in pool
            ) + "\n\n"
        # batched scoring when the model supports it (one device call per
        # length bucket vs one per choice)
        pairs = [
            (prefix + item["query"], " " + c.lstrip())
            for item in items for c in item["choices"]
        ]
        if hasattr(model, "get_loglikelihood_batch"):
            flat = model.get_loglikelihood_batch(pairs)
        else:
            flat = [model.get_loglikelihood(q, c) for q, c in pairs]
        correct = correct_norm = 0
        cursor = 0
        for item in items:
            choices = item["choices"]
            gold = int(item["gold"])
            lls = flat[cursor : cursor + len(choices)]
            cursor += len(choices)
            if int(max(range(len(lls)), key=lambda i: lls[i])) == gold:
                correct += 1
            # length-normalized (acc_norm): divide by continuation chars
            norm = [ll / max(len(c), 1) for ll, c in zip(lls, choices)]
            if int(max(range(len(norm)), key=lambda i: norm[i])) == gold:
                correct_norm += 1
        acc = correct / len(items)
        acc_norm = correct_norm / len(items)
        return {
            "task": self.name,
            "metric": self.metric,
            "score": acc_norm if self.metric == "acc_norm" else acc,
            "acc": acc,
            "acc_norm": acc_norm,
            "num_items": len(items),
        }


def generate_config_template(preset: str = "standard") -> Dict[str, Any]:
    """Config template for a preset's tasks (reference lm_eval_utils:41-191)."""
    if preset not in PRESETS:
        raise ValueError(f"unknown preset: {preset} (known: {sorted(PRESETS)})")
    return {
        name: {
            "enabled": True,
            "num_fewshot": TASK_REGISTRY[name]["num_fewshot"],
            "limit": 50,
            "metric": TASK_REGISTRY[name]["metric"],
        }
        for name in PRESETS[preset]
    }


def main(argv=None) -> int:
    """Task-utility CLI (reference lm_eval_utils.py:262-297)."""
    import argparse

    ap = argparse.ArgumentParser(description="Task registry utilities")
    ap.add_argument("--list", action="store_true", help="list all tasks")
    ap.add_argument("--presets", action="store_true", help="list presets")
    ap.add_argument("--template", metavar="PRESET", help="print a config template")
    args = ap.parse_args(argv)
    if args.list:
        for name, info in sorted(TASK_REGISTRY.items()):
            print(f"{name:18s} metric={info['metric']:16s} fewshot={info['num_fewshot']} "
                  f"category={info['category']}")
    elif args.presets:
        for name, tasks in PRESETS.items():
            print(f"{name}: {', '.join(tasks)}")
    elif args.template:
        print(json.dumps(generate_config_template(args.template), indent=2))
    else:
        print(f"{len(TASK_REGISTRY)} tasks, {len(PRESETS)} presets (--list / --presets / --template)")
    return 0


def build_corpus_qa_task(
    qa_path: str = "/root/reference/data/2308.07633v4-qa.json",
    num_choices: int = 4,
    seed: int = 0,
) -> Optional[MultipleChoiceTask]:
    """Deterministic MC task from the bundled QA corpus: the correct answer
    vs distractor answers drawn from other questions."""
    if not os.path.exists(qa_path):
        return None
    import random

    with open(qa_path) as f:
        qa = json.load(f)
    rng = random.Random(seed)
    items = []
    for i, item in enumerate(qa):
        others = [q["answer"] for j, q in enumerate(qa) if j != i]
        distractors = rng.sample(others, min(num_choices - 1, len(others)))
        choices = distractors + [item["answer"]]
        rng.shuffle(choices)
        items.append(
            {
                "query": f"Question: {item['question']}\nAnswer:",
                "choices": choices,
                "gold": choices.index(item["answer"]),
            }
        )
    return MultipleChoiceTask("corpus_qa_mc", items)
