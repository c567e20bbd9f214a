"""LoRA adapters over (optionally quantized) transformer weights.

The QLoRA-equivalent of the reference's PEFT setup
(``finetuning/trainer.py:229-236,276-317``): low-rank A/B factors attached to
the seven projection matrices (q/k/v/o/gate/up/down), with the frozen base
weight kept in its quantized form — so int4 base + bf16 adapters is exactly
the reference's ``prepare_model_for_kbit_training`` + ``LoraConfig`` shape,
TPU-native.

``LoRAWeight`` is a pytree node that ``crs_tpu.models.quantized.qmatmul``
dispatches on: ``x @ W_base + (x @ A) @ B · (α/r)``. Only A/B are trainable
(see :func:`lora_trainable_mask` for the optax mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LoRAWeight", "add_lora", "lora_trainable_mask", "merge_lora", "extract_lora", "DEFAULT_TARGETS"]

# the reference's 7 projection targets (finetuning/trainer.py:301-307)
DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LoRAWeight:
    """base (array or QuantizedTensor) + trainable low-rank A/B factors."""

    base: Any
    lora_a: jax.Array  # [in, r]
    lora_b: jax.Array  # [r, out]
    alpha: float
    rank: int

    def tree_flatten(self):
        return (self.base, self.lora_a, self.lora_b), (self.alpha, self.rank)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, a, b = children
        alpha, rank = aux
        return cls(base, a, b, alpha, rank)

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return getattr(self.base, "dtype", jnp.bfloat16)


def _base_shape(w: Any) -> Tuple[int, int]:
    return tuple(w.shape)


def add_lora(
    params: Dict[str, Any],
    key: jax.Array,
    rank: int = 16,
    alpha: float = 32.0,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    dtype: Any = jnp.bfloat16,
) -> Dict[str, Any]:
    """Wrap target attn/mlp weights of a transformer params pytree in LoRA.

    A is kaiming-ish normal, B is zeros (standard LoRA init: adapters start
    as identity).
    """
    keys = iter(jax.random.split(key, 4096))

    def wrap(w: Any) -> LoRAWeight:
        kin, kout = _base_shape(w)
        a = (jax.random.normal(next(keys), (kin, rank), jnp.float32) * (kin**-0.5)).astype(dtype)
        b = jnp.zeros((rank, kout), dtype)
        return LoRAWeight(w, a, b, alpha, rank)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = {k: dict(v) if isinstance(v, dict) else v for k, v in layer.items()}
        for grp in ("attn", "mlp"):
            for name in list(new_layer[grp]):
                if name in targets:
                    new_layer[grp][name] = wrap(new_layer[grp][name])
        out["layers"].append(new_layer)
    return out


def lora_trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of booleans: True only for lora_a / lora_b leaves (for
    ``optax.masked`` — the reference freezes everything but adapters)."""

    def visit(node: Any) -> Any:
        if isinstance(node, LoRAWeight):
            return LoRAWeight(
                jax.tree.map(lambda _: False, node.base),
                True, True, node.alpha, node.rank,
            )
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return False

    return visit(params)


def merge_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold adapters into dense base weights (inference export).

    Quantized bases are dequantized first — merging changes the weight, so
    the result is full precision (re-quantize afterwards if wanted).
    """

    def visit(node: Any) -> Any:
        if isinstance(node, LoRAWeight):
            base = node.base
            dense = base.dequantize() if hasattr(base, "dequantize") else base.astype(jnp.float32)
            delta = (node.lora_a.astype(jnp.float32) @ node.lora_b.astype(jnp.float32)) * node.scaling
            return (dense + delta).astype(getattr(base, "dtype", jnp.bfloat16))
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def extract_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Adapter-only state dict {path: {a, b, alpha, rank}} for saving."""
    out: Dict[str, Any] = {}

    def visit(path: str, node: Any) -> None:
        if isinstance(node, LoRAWeight):
            out[path] = {
                "a": node.lora_a, "b": node.lora_b,
                "alpha": node.alpha, "rank": node.rank,
            }
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(f"{path}.{k}" if path else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(f"{path}[{i}]", v)

    visit("", params)
    return out


def apply_lora_matmul(x: jax.Array, w: LoRAWeight) -> jax.Array:
    """x @ (base + A·B·scale); called from qmatmul's dispatch."""
    from ..models.quantized import qmatmul

    base_out = qmatmul(x, w.base)
    delta = jnp.dot(
        jnp.dot(x, w.lora_a.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype),
        w.lora_b.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(base_out.dtype)
    return base_out + delta * w.scaling
