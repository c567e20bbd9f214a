"""Memory accounting (parity: reference efficiency/memory.py).

- model size from parameter bytes (:12-35) including quantized-code widths
  (the reference sniffs bitsandbytes quant_state :65-124; we read our own
  QuantizedTensor metadata),
- parameter counts (:38-62),
- device memory stats via ``device.memory_stats()`` replacing
  ``torch.cuda.max_memory_allocated`` (:127-191),
- analytic KV-cache estimate ``2·L·B·H_kv·S·d·bytes`` (:232-272).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

__all__ = [
    "get_model_size",
    "get_parameter_count",
    "get_bits_per_param",
    "get_device_memory",
    "get_memory_efficiency",
    "estimate_kv_cache_size",
]


def get_model_size(model) -> Dict[str, Any]:
    info = model.get_model_info()
    return {
        "model_size_gb": info.get("model_size_gb"),
        "model_size_mb": (info.get("model_size_gb") or 0.0) * 1000.0,
    }


def get_parameter_count(model) -> Dict[str, Any]:
    info = model.get_model_info()
    n = info.get("num_parameters", 0)
    return {"num_parameters": n, "num_parameters_b": n / 1e9}


def get_bits_per_param(model) -> Dict[str, Any]:
    info = model.get_model_info()
    return {
        "bits_per_param": info.get("bits_per_param"),
        "quantization": info.get("quantization"),
    }


def get_device_memory() -> Dict[str, Any]:
    """Per-device memory stats (bytes in use / peak where the backend
    exposes them)."""
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", in_use)
        if peak == 0:  # backend doesn't expose memory stats (e.g. axon tunnel)
            return {"device_memory_in_use_mb": None, "device_memory_peak_mb": None}
        out = {
            "device_memory_in_use_mb": in_use / 1e6,
            "device_memory_peak_mb": peak / 1e6,
            "device_memory_limit_mb": stats.get("bytes_limit", 0) / 1e6,
        }
        return out
    except Exception as e:  # pragma: no cover - backend dependent
        logger.warning("memory stats unavailable: %s", e)
        return {"device_memory_in_use_mb": None, "device_memory_peak_mb": None}


def get_memory_efficiency(model_size_mb: Optional[float], peak_mb: Optional[float]) -> Dict[str, Any]:
    """size/peak ratio (reference :194-212)."""
    if not model_size_mb or not peak_mb:
        return {"memory_efficiency": None}
    return {"memory_efficiency": model_size_mb / peak_mb}


def estimate_kv_cache_size(
    num_layers: int,
    num_kv_heads: int,
    head_dim: int,
    seq_len: int = 2048,
    batch_size: int = 1,
    bytes_per_elem: int = 2,
) -> Dict[str, Any]:
    """Analytic 2·L·B·Hkv·S·hd·bytes (reference :232-272)."""
    size = 2 * num_layers * batch_size * num_kv_heads * seq_len * head_dim * bytes_per_elem
    return {"kv_cache_size_mb": size / 1e6, "kv_cache_seq_len": seq_len}
