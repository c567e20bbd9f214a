from .topk import exact_topk, merge_topk
from .quant import scalar_quantize, scalar_dequantize, int8_topk

__all__ = [
    "exact_topk",
    "merge_topk",
    "scalar_quantize",
    "scalar_dequantize",
    "int8_topk",
]
