from .topk import exact_topk, blockwise_topk, merge_topk
from .quant import scalar_quantize, scalar_dequantize, int8_topk
from .pq import PQCodebook, train_pq, pq_encode, pq_adc_topk, kmeans
from .mmr import mmr_select, mmr_select_batch
from .pallas_scan import (
    pallas_topk,
    pallas_topk_int8,
    pallas_topk_segmax,
    pallas_topk_segmax_int8,
)

__all__ = [
    "exact_topk",
    "blockwise_topk",
    "merge_topk",
    "scalar_quantize",
    "scalar_dequantize",
    "int8_topk",
    "PQCodebook",
    "train_pq",
    "pq_encode",
    "pq_adc_topk",
    "kmeans",
    "mmr_select",
    "mmr_select_batch",
    "pallas_topk",
    "pallas_topk_int8",
    "pallas_topk_segmax",
    "pallas_topk_segmax_int8",
]
