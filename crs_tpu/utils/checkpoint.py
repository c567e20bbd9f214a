"""Pytree checkpointing: save/load params (incl. quantized/LoRA nodes) as npz.

Capability parity with the reference's prequantized-model cache
(``models/hqq_model.py:83-95,129-134`` — save once, reload without
re-quantizing) generalized to any params pytree: arrays are stored
path-keyed in one compressed npz (bf16 as float32 + dtype tag), structured
nodes (QuantizedTensor, LoRAWeight) record their static aux data in a JSON
manifest and are reconstructed on load.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _encode_array(arr) -> Tuple[np.ndarray, str]:
    dtype = str(arr.dtype)
    a = np.asarray(arr.astype(jnp.float32)) if dtype == "bfloat16" else np.asarray(arr)
    return a, dtype


def save_pytree(path: str, tree: Any) -> None:
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {"nodes": {}, "arrays": {}}

    def visit(prefix: str, node: Any) -> Any:
        tname = type(node).__name__
        if tname == "QuantizedTensor":
            manifest["nodes"][prefix] = {
                "kind": "QuantizedTensor",
                "bits": node.bits,
                "group_size": node.group_size,
                "shape": list(node.shape),
            }
            visit(f"{prefix}.codes", node.codes)
            visit(f"{prefix}.scales", node.scales)
            return None
        if tname == "LoRAWeight":
            manifest["nodes"][prefix] = {
                "kind": "LoRAWeight", "alpha": node.alpha, "rank": node.rank,
            }
            visit(f"{prefix}.base", node.base)
            visit(f"{prefix}.lora_a", node.lora_a)
            visit(f"{prefix}.lora_b", node.lora_b)
            return None
        if isinstance(node, dict):
            manifest["nodes"][prefix] = {"kind": "dict", "keys": list(node.keys())}
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else str(k), v)
            return None
        if isinstance(node, list):
            manifest["nodes"][prefix] = {"kind": "list", "len": len(node)}
            for i, v in enumerate(node):
                visit(f"{prefix}[{i}]", v)
            return None
        a, dtype = _encode_array(node)
        key = f"a{len(arrays)}"
        arrays[key] = a
        manifest["arrays"][prefix] = {"key": key, "dtype": dtype}
        return None

    visit("", tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def load_pytree(path: str) -> Any:
    with open(path + ".json") as f:
        manifest = json.load(f)
    data = np.load(path + ".npz")
    nodes, arr_meta = manifest["nodes"], manifest["arrays"]

    def build(prefix: str) -> Any:
        if prefix in arr_meta:
            info = arr_meta[prefix]
            a = data[info["key"]]
            dtype = info["dtype"]
            return jnp.asarray(a, jnp.bfloat16 if dtype == "bfloat16" else a.dtype)
        info = nodes[prefix]
        kind = info["kind"]
        if kind == "dict":
            return {
                k: build(f"{prefix}.{k}" if prefix else str(k)) for k in info["keys"]
            }
        if kind == "list":
            return [build(f"{prefix}[{i}]") for i in range(info["len"])]
        if kind == "QuantizedTensor":
            from ..models.quantized import QuantizedTensor

            return QuantizedTensor(
                build(f"{prefix}.codes"), build(f"{prefix}.scales"),
                info["bits"], info["group_size"], tuple(info["shape"]),
            )
        if kind == "LoRAWeight":
            from ..finetuning.lora import LoRAWeight

            return LoRAWeight(
                build(f"{prefix}.base"), build(f"{prefix}.lora_a"),
                build(f"{prefix}.lora_b"), info["alpha"], info["rank"],
            )
        raise ValueError(f"unknown node kind: {kind}")

    return build("")
