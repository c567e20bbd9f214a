"""lm-eval-harness adapter (parity: reference ModelInterface.get_lm_eval_model,
models/model_interface.py:108-124, and lm_eval_wrapper.py:252-413).

Wraps a :class:`~crs_tpu.models.model_interface.JaxModel` as an
``lm_eval.api.model.LM`` so harness tasks run against the TPU model. Fully
gated: importing this module without ``lm_eval`` raises ImportError, which
callers treat as "harness unavailable" (the zero-egress default).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

from lm_eval.api.model import LM  # type: ignore

logger = logging.getLogger(__name__)

__all__ = ["JaxLM", "run_lm_eval_harness"]


class JaxLM(LM):
    def __init__(self, model, batch_size: int = 1):
        super().__init__()
        self.model = model
        self.batch_size = batch_size

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            context, continuation = req.args
            ll = self.model.get_loglikelihood(context, continuation)
            # greedy check: is the continuation the greedy decode?
            out.append((ll, False))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            (text,) = req.args
            out.append(self.model.get_loglikelihood("", text))
        return out

    def generate_until(self, requests) -> List[str]:
        out = []
        for req in requests:
            context, gen_kwargs = req.args
            until = gen_kwargs.get("until", [])
            max_toks = gen_kwargs.get("max_gen_toks", 128)
            text = self.model.generate(context, max_new_tokens=max_toks, temperature=0.0)
            for stop in until:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            out.append(text)
        return out


def run_lm_eval_harness(
    model,
    tasks: List[str],
    num_fewshot: Optional[int] = None,
    limit: Optional[int] = None,
    seed: int = 1234,
) -> Dict[str, Any]:
    """Run harness tasks with pinned seeds (reference :345-366)."""
    import lm_eval  # type: ignore

    lm = JaxLM(model)
    results = lm_eval.simple_evaluate(
        model=lm,
        tasks=tasks,
        num_fewshot=num_fewshot,
        limit=limit,
        random_seed=seed,
        numpy_random_seed=seed,
        torch_random_seed=seed,
    )
    return results.get("results", {})


def get_metric_from_results(results: Dict[str, Any], task: str, metric: str) -> Optional[float]:
    """Metric extraction with name-variation fallbacks (reference :191-249)."""
    task_res = results.get(task, {})
    for candidate in (metric, f"{metric},none", "acc,none", "acc_norm,none", "acc", "acc_norm"):
        if candidate in task_res:
            return float(task_res[candidate])
    return None
