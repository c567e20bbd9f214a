"""LoRA finetuning with evaluation-in-the-loop (parity: reference
finetuning/trainer.py).

- ``EvaluationCallback`` (:26-190): after each epoch, runs an
  ``EvaluationRunner`` into ``epoch_N/`` directories, tracks the best
  metric/epoch (direction-aware), persists ``evaluation_history.json`` and a
  final summary.
- ``QuantizedModelFinetuner`` (:193-625): QLoRA-equivalent preparation
  (quantized frozen base + LoRA r=16/α=32 over the 7 projection modules),
  instruction-format dataset tokenization (:319-381), AdamW (masked to
  adapters) with warmup + cosine decay and gradient clipping (:239-254),
  **checkpoint resume** from the highest ``checkpoint-*`` directory
  (:493-499) with ``save_total_limit`` pruning (:249), adapter save + config
  snapshot (:527-548), and a training-time estimator (:592-625).

The training step is one jitted function (loss + grads + masked AdamW
update); batches are padded to fixed shapes so the step compiles once.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation.base import higher_is_better
from ..models.transformer import forward
from .base import BaseDatasetLoader, DatasetSample
from .lora import add_lora, extract_lora, lora_trainable_mask

logger = logging.getLogger(__name__)

__all__ = ["EvaluationCallback", "QuantizedModelFinetuner"]


class EvaluationCallback:
    """Per-epoch benchmark runs with best-model tracking (reference :26-190)."""

    def __init__(
        self,
        model_interface,
        pipeline=None,
        eval_config: Optional[Dict[str, Any]] = None,
        output_dir: str = "finetune_eval",
        metric: str = "perplexity",
        benchmarks: Sequence[str] = ("performance",),
    ):
        self.model = model_interface
        self.pipeline = pipeline
        self.eval_config = eval_config or {}
        self.output_dir = output_dir
        self.metric = metric
        self.benchmarks = tuple(benchmarks)
        self.history: List[Dict[str, Any]] = []
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None

    def on_epoch_end(self, epoch: int) -> Dict[str, Any]:
        from ..evaluation.runner import EvaluationRunner

        out_dir = os.path.join(self.output_dir, f"epoch_{epoch}")
        runner = EvaluationRunner(
            model=self.model, pipeline=self.pipeline,
            config=self.eval_config, output_dir=out_dir,
        )
        res = runner.run_all(
            run_efficiency="efficiency" in self.benchmarks,
            run_performance="performance" in self.benchmarks,
            run_retrieval="retrieval" in self.benchmarks,
        )
        summary = res.get_summary()
        value = summary.get(self.metric)
        entry = {"epoch": epoch, "metric": self.metric, "value": value, "summary": summary}
        self.history.append(entry)
        self._update_best(epoch, value)
        self._persist()
        return entry

    def _update_best(self, epoch: int, value: Optional[float]) -> None:
        if value is None:
            return
        hib = higher_is_better(self.metric)
        better = (
            self.best_value is None
            or (hib is not False and value > self.best_value)
            or (hib is False and value < self.best_value)
        )
        if better:
            self.best_value, self.best_epoch = value, epoch
            logger.info("new best %s=%.4f at epoch %d", self.metric, value, epoch)

    def _persist(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        with open(os.path.join(self.output_dir, "evaluation_history.json"), "w") as f:
            json.dump(
                {
                    "history": self.history,
                    "best_metric": self.metric,
                    "best_value": self.best_value,
                    "best_epoch": self.best_epoch,
                },
                f, indent=2, default=str,
            )


class QuantizedModelFinetuner:
    def __init__(self, model_interface, config: Optional[Dict[str, Any]] = None):
        self.model = model_interface
        cfg = config or {}
        self.rank = int(cfg.get("lora_rank", 16))
        self.alpha = float(cfg.get("lora_alpha", 32.0))
        self.learning_rate = float(cfg.get("learning_rate", 2e-4))
        self.weight_decay = float(cfg.get("weight_decay", 0.01))
        self.num_epochs = int(cfg.get("num_epochs", 1))
        self.batch_size = int(cfg.get("batch_size", 4))
        self.max_seq_len = int(cfg.get("max_seq_len", 256))
        self.warmup_steps = int(cfg.get("warmup_steps", 10))
        self.grad_clip = float(cfg.get("grad_clip", 1.0))
        self.output_dir = cfg.get("output_dir", "finetune_out")
        self.save_total_limit = int(cfg.get("save_total_limit", 3))
        self.checkpoint_every = int(cfg.get("checkpoint_every", 50))
        self.seed = int(cfg.get("seed", 0))
        self.callback: Optional[EvaluationCallback] = None
        self._tx = None
        self._opt_state = None
        self._train_step = None
        self.global_step = 0

    # -- preparation (reference :229-317) ------------------------------------
    def prepare_model(self) -> None:
        """Attach LoRA adapters to the (possibly quantized) model params."""
        self.model._ensure()
        self.model.params = add_lora(
            self.model.params,
            jax.random.PRNGKey(self.seed),
            rank=self.rank,
            alpha=self.alpha,
        )
        logger.info("LoRA attached: r=%d alpha=%.0f", self.rank, self.alpha)

    def setup_evaluation(self, **kw) -> EvaluationCallback:
        self.callback = EvaluationCallback(self.model, **kw)
        return self.callback

    # -- data (reference :319-381) --------------------------------------------
    def prepare_batches(self, samples: Sequence[DatasetSample]) -> List[Dict[str, np.ndarray]]:
        """Tokenize instruction prompts into fixed-shape training batches.

        Loss is masked to real (non-pad) next-token positions; like the
        reference, the full formatted prompt (instruction + response) is
        trained on.
        """
        tok = self.model.tokenizer
        encoded = []
        for s in samples:
            text = BaseDatasetLoader.format_prompt(s, include_output=True)
            ids = tok.encode(text, max_length=self.max_seq_len)
            if len(ids) >= 2:
                encoded.append(ids)
        pad_id = getattr(tok, "pad_id", 0)
        batches = []
        for start in range(0, len(encoded), self.batch_size):
            group = encoded[start : start + self.batch_size]
            ids = np.full((self.batch_size, self.max_seq_len), pad_id, np.int32)
            mask = np.zeros((self.batch_size, self.max_seq_len), np.bool_)
            for row, seq in enumerate(group):
                ids[row, : len(seq)] = seq
                mask[row, : len(seq)] = True
            batches.append({"ids": ids, "mask": mask})
        return batches

    # -- optimizer / step ------------------------------------------------------
    def _build_optimizer(self, total_steps: int):
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=self.learning_rate,
            warmup_steps=min(self.warmup_steps, max(total_steps // 10, 1)),
            decay_steps=max(total_steps, 1),
        )
        mask = lora_trainable_mask(self.model.params)
        labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
        # multi_transform (NOT optax.masked alone): masked-out updates pass
        # through unchanged, which would apply raw gradients to the frozen
        # base — frozen leaves must get set_to_zero explicitly.
        # Zero the frozen grads BEFORE the global-norm clip: value_and_grad
        # still produces full-precision base-weight gradients, and if they
        # enter the norm they dominate it and over-clip the adapter updates.
        tx = optax.chain(
            optax.multi_transform(
                {
                    "train": optax.identity(),
                    "freeze": optax.set_to_zero(),
                },
                labels,
            ),
            optax.clip_by_global_norm(self.grad_clip),
            optax.multi_transform(
                {
                    "train": optax.adamw(schedule, weight_decay=self.weight_decay),
                    "freeze": optax.set_to_zero(),
                },
                labels,
            ),
        )
        return tx

    def _make_train_step(self, cfg):
        def loss_fn(params, ids, mask):
            logits = forward(params, cfg, ids, mask)  # [B, S, V] f32
            targets = ids[:, 1:]
            logit_slice = logits[:, :-1, :]
            valid = mask[:, 1:] & mask[:, :-1]
            losses = optax.softmax_cross_entropy_with_integer_labels(logit_slice, targets)
            return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)

        @jax.jit
        def step(params, opt_state, ids, mask):
            # allow_int: quantized bases have int8 leaves; their cotangents
            # come back as float0 and are replaced with no-op zeros (the
            # masked optimizer never updates them anyway).
            loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params, ids, mask)
            grads = jax.tree.map(
                # float32 zeros (not zeros_like): int8 zeros would break
                # clip_by_global_norm's dtype-uniform select.
                lambda g, p: jnp.zeros(p.shape, jnp.float32) if g.dtype == jax.dtypes.float0 else g,
                grads, params,
            )
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    # -- training loop (reference :422-506) ------------------------------------
    def train(
        self,
        train_samples: Sequence[DatasetSample],
        eval_samples: Optional[Sequence[DatasetSample]] = None,
        resume: bool = True,
    ) -> Dict[str, Any]:
        if not any(
            type(w).__name__ == "LoRAWeight"
            for w in jax.tree.leaves(self.model.params, is_leaf=lambda x: type(x).__name__ == "LoRAWeight")
        ):
            self.prepare_model()
        batches = self.prepare_batches(train_samples)
        if not batches:
            raise ValueError("no training batches produced")
        total_steps = len(batches) * self.num_epochs
        self._tx = self._build_optimizer(total_steps)
        self._opt_state = self._tx.init(self.model.params)
        self._train_step = self._make_train_step(self.model.cfg)
        start_epoch = 0
        if resume:
            start_epoch = self._try_resume()

        history: List[Dict[str, Any]] = []
        t0 = time.perf_counter()
        for epoch in range(start_epoch, self.num_epochs):
            epoch_losses = []
            for batch in batches:
                self.model.params, self._opt_state, loss = self._train_step(
                    self.model.params, self._opt_state,
                    jnp.asarray(batch["ids"]), jnp.asarray(batch["mask"]),
                )
                self.global_step += 1
                epoch_losses.append(float(loss))
                if self.global_step % self.checkpoint_every == 0:
                    self._save_checkpoint(epoch)
            mean_loss = float(np.mean(epoch_losses))
            entry: Dict[str, Any] = {"epoch": epoch, "loss": mean_loss, "steps": self.global_step}
            logger.info("epoch %d: loss=%.4f", epoch, mean_loss)
            if eval_samples:
                entry["eval_loss"] = self.evaluate_loss(eval_samples)
            if self.callback is not None:
                entry["evaluation"] = self.callback.on_epoch_end(epoch)
            history.append(entry)
            self._save_checkpoint(epoch)
        wall = time.perf_counter() - t0
        result = {
            "history": history,
            "train_time_s": wall,
            "total_steps": self.global_step,
            "final_loss": history[-1]["loss"] if history else None,
        }
        os.makedirs(self.output_dir, exist_ok=True)
        with open(os.path.join(self.output_dir, "train_result.json"), "w") as f:
            json.dump(result, f, indent=2, default=str)
        return result

    def evaluate_loss(self, samples: Sequence[DatasetSample]) -> float:
        batches = self.prepare_batches(samples)
        cfg = self.model.cfg
        losses = []
        for b in batches:
            logits = forward(self.model.params, cfg, jnp.asarray(b["ids"]), jnp.asarray(b["mask"]))
            targets = b["ids"][:, 1:]
            valid = b["mask"][:, 1:] & b["mask"][:, :-1]
            ls = optax.softmax_cross_entropy_with_integer_labels(
                jnp.asarray(logits[:, :-1, :]), jnp.asarray(targets)
            )
            losses.append(float(jnp.sum(ls * valid) / jnp.maximum(jnp.sum(valid), 1)))
        return float(np.mean(losses)) if losses else float("nan")

    # -- checkpointing (reference :493-506, save_total_limit :249) -------------
    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.output_dir, f"checkpoint-{step}")

    def _save_checkpoint(self, epoch: int) -> str:
        path = self._ckpt_dir(self.global_step)
        os.makedirs(path, exist_ok=True)
        adapters = extract_lora(self.model.params)
        arrays = {}
        manifest = {"step": self.global_step, "epoch": epoch, "adapters": {}}
        for i, (name, ad) in enumerate(sorted(adapters.items())):
            arrays[f"a_{i}"] = np.asarray(ad["a"], np.float32)
            arrays[f"b_{i}"] = np.asarray(ad["b"], np.float32)
            manifest["adapters"][name] = {"index": i, "alpha": ad["alpha"], "rank": ad["rank"]}
        np.savez_compressed(os.path.join(path, "adapters.npz"), **arrays)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        self._prune_checkpoints()
        return path

    def _prune_checkpoints(self) -> None:
        ckpts = self._list_checkpoints()
        while len(ckpts) > self.save_total_limit:
            victim = ckpts.pop(0)  # lowest step
            shutil.rmtree(os.path.join(self.output_dir, f"checkpoint-{victim}"), ignore_errors=True)

    def _list_checkpoints(self) -> List[int]:
        if not os.path.isdir(self.output_dir):
            return []
        steps = []
        for name in os.listdir(self.output_dir):
            mm = re.fullmatch(r"checkpoint-(\d+)", name)
            if mm:
                steps.append(int(mm.group(1)))
        return sorted(steps)

    def _try_resume(self) -> int:
        """Resume adapters from the highest checkpoint-* (reference :493-499).

        Restores adapter weights + the step counter; optimizer moments restart
        fresh (a deliberate simplification — with warmup+cosine over the
        remaining steps the effect on LoRA adapters is minor).
        """
        ckpts = self._list_checkpoints()
        if not ckpts:
            return 0
        step = ckpts[-1]
        path = self._ckpt_dir(step)
        try:
            epoch = self.load_adapters(path)
            self.global_step = step
            logger.info("resumed from %s (epoch %d)", path, epoch)
            return epoch + 1
        except Exception as e:
            logger.warning("resume failed from %s: %s", path, e)
            return 0

    def load_adapters(self, path: str) -> int:
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        arrays = np.load(os.path.join(path, "adapters.npz"))
        by_name = {
            name: (arrays[f"a_{info['index']}"], arrays[f"b_{info['index']}"])
            for name, info in manifest["adapters"].items()
        }
        from .lora import LoRAWeight

        def visit(prefix: str, node: Any) -> Any:
            if isinstance(node, LoRAWeight):
                if prefix in by_name:
                    a, b = by_name[prefix]
                    return LoRAWeight(
                        node.base, jnp.asarray(a, node.lora_a.dtype),
                        jnp.asarray(b, node.lora_b.dtype), node.alpha, node.rank,
                    )
                return node
            if isinstance(node, dict):
                return {k: visit(f"{prefix}.{k}" if prefix else k, v) for k, v in node.items()}
            if isinstance(node, list):
                return [visit(f"{prefix}[{i}]", v) for i, v in enumerate(node)]
            return node

        self.model.params = visit("", self.model.params)
        return int(manifest.get("epoch", 0))

    # -- export (reference :527-548) -------------------------------------------
    def save_model(self, out_dir: Optional[str] = None) -> str:
        out_dir = out_dir or os.path.join(self.output_dir, "final")
        path = self._save_checkpoint(epoch=self.num_epochs - 1)
        os.makedirs(out_dir, exist_ok=True)
        for fname in ("adapters.npz", "manifest.json"):
            shutil.copy(os.path.join(path, fname), os.path.join(out_dir, fname))
        snapshot = {
            "lora_rank": self.rank,
            "lora_alpha": self.alpha,
            "learning_rate": self.learning_rate,
            "num_epochs": self.num_epochs,
            "batch_size": self.batch_size,
            "max_seq_len": self.max_seq_len,
            "model": self.model.get_model_info(),
        }
        with open(os.path.join(out_dir, "training_config.json"), "w") as f:
            json.dump(snapshot, f, indent=2, default=str)
        return out_dir

    # -- estimation (reference :592-625) ----------------------------------------
    def estimate_training_time(
        self, num_samples: int, measured_step_s: Optional[float] = None
    ) -> Dict[str, Any]:
        steps_per_epoch = -(-num_samples // self.batch_size)
        total_steps = steps_per_epoch * self.num_epochs
        step_s = measured_step_s or 0.5
        return {
            "steps_per_epoch": steps_per_epoch,
            "total_steps": total_steps,
            "est_step_s": step_s,
            "est_total_s": total_steps * step_s,
            "est_total_h": total_steps * step_s / 3600.0,
        }
