"""Calibrated weight-only quantization: AWQ-style activation-aware scaling
and GPTQ-style error-compensated rounding.

The round-1 int4/int3/int2 kernels used plain round-to-nearest (RTN); the
*algorithms* that let 4-bit match fp16 quality live here (VERDICT r1 #5):

- **AWQ equivalent** (reference ``models/awq_model.py:68-74``): per-input-
  channel scales ``s = (mean|x|)^α`` chosen by a grid search over α that
  minimizes the calibration-weighted reconstruction error
  ``tr(ΔᵀHΔ), Δ = W − diag(1/s)·Q(diag(s)·W)`` with ``H = E[xxᵀ]``.
  Scales fold losslessly into the preceding op so inference is unchanged:
  q/k/v ← attn_norm.scale, gate/up ← mlp_norm.scale, down ← up's output
  channels (the SwiGLU product is linear in up), o ← v's output channels
  (shared across GQA query groups so the fold is well-defined).
- **GPTQ equivalent** (reference ``models/gptq_model.py:75-84``):
  column-serial error-compensated rounding against the Cholesky factor of
  the inverse calibration Hessian, group-wise scales recomputed from the
  error-updated weights at each group boundary.

Calibration statistics (per-site mean|x| and Gram ``XᵀX``) are computed ON
device from :func:`~crs_tpu.models.transformer.forward_captured` — the MXU
does the Grams; only the reduced stats come to host. The rounding loops run
host-side in numpy (they are serial by construction and run once per model).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .quantized import QuantizedTensor, quantize_tensor, tensor_from_int_codes
from .transformer import TransformerConfig, forward_captured

logger = logging.getLogger(__name__)

__all__ = [
    "collect_calibration_stats",
    "awq_quantize_params",
    "gptq_quantize_params",
    "quantize_params_calibrated",
]

SITES = ("attn_in", "o_in", "mlp_in", "down_in")


def _site_stats(x: jax.Array, mask: jax.Array):
    """(sum|x| [D], gram [D, D], count) over real (unmasked) tokens."""
    d = x.shape[-1]
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = mask.reshape(-1).astype(jnp.float32)
    xm = x2 * m[:, None]
    return (
        jnp.sum(jnp.abs(xm), axis=0),
        jnp.dot(xm.T, x2, preferred_element_type=jnp.float32),
        jnp.sum(m),
    )


def collect_calibration_stats(
    params, cfg: TransformerConfig, batches: Sequence[Tuple[np.ndarray, np.ndarray]]
) -> List[Dict[str, Dict[str, np.ndarray]]]:
    """Run calibration batches, return per-layer per-site {mean_abs, gram}.

    ``batches`` is a sequence of (ids [B, S], mask [B, S]) arrays. Stats are
    accumulated across batches; the Gram matmuls run on device.
    """

    @jax.jit
    def batch_stats(p, ids, mask):
        _, sites = forward_captured(p, cfg, ids, mask)
        return [
            {name: _site_stats(cap[name], mask) for name in SITES}
            for cap in sites
        ]

    acc: Optional[List[Dict[str, list]]] = None
    for ids, mask in batches:
        out = batch_stats(params, jnp.asarray(ids), jnp.asarray(mask))
        out = jax.tree.map(np.asarray, out)
        if acc is None:
            acc = out
        else:
            acc = jax.tree.map(np.add, acc, out)
    stats: List[Dict[str, Dict[str, np.ndarray]]] = []
    for layer in acc:
        entry = {}
        for name, (sabs, gram, count) in layer.items():
            c = max(float(count), 1.0)
            entry[name] = {"mean_abs": sabs / c, "gram": gram / c}
        stats.append(entry)
    return stats


# ---------------------------------------------------------------------------
# AWQ: activation-aware scale search
# ---------------------------------------------------------------------------

def _rtn_dequant(w: np.ndarray, bits: int, group_size: int) -> np.ndarray:
    """Round-to-nearest group-wise quantize→dequantize (numpy mirror of
    quantize_tensor's math, used inside the scale search)."""
    kin, kout = w.shape
    qmax = 7 if bits == 4 else (1 << (bits - 1)) - 1
    g = group_size if kin % group_size == 0 else kin
    grouped = w.reshape(kin // g, g, kout)
    amax = np.max(np.abs(grouped), axis=1)
    scales = np.maximum(amax, 1e-12) / qmax
    vals = np.clip(np.round(grouped / scales[:, None, :]), -qmax, qmax)
    return (vals * scales[:, None, :]).reshape(kin, kout)


def _recon_error(w: np.ndarray, w_hat: np.ndarray, gram: np.ndarray) -> float:
    delta = (w - w_hat).astype(np.float64)
    return float(np.sum(delta * (gram.astype(np.float64) @ delta)))


def awq_search_scale(
    weights: Sequence[np.ndarray],
    mean_abs: np.ndarray,
    gram: np.ndarray,
    bits: int,
    group_size: int,
    alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
) -> np.ndarray:
    """Grid-search the AWQ scale exponent minimizing summed reconstruction
    error over the (co-located) weight matrices sharing this input."""
    x = np.maximum(mean_abs.astype(np.float64), 1e-8)
    best_s, best_err = None, np.inf
    for alpha in alphas:
        s = (x ** alpha)
        s = s / np.exp(np.mean(np.log(s)))  # geometric-mean normalize
        s = np.clip(s, 1e-4, 1e4).astype(np.float32)
        err = 0.0
        for w in weights:
            ws = w * s[:, None]
            w_hat = _rtn_dequant(ws, bits, group_size) / s[:, None]
            err += _recon_error(w, w_hat, gram)
        if err < best_err:
            best_err, best_s = err, s
    return best_s


def awq_quantize_params(
    params, cfg: TransformerConfig, stats, bits: int = 4, group_size: int = 128,
) -> Dict[str, Any]:
    """Activation-aware quantization of every transformer linear, with the
    inverse scales folded into the preceding op (see module docstring)."""
    out = {
        "embed": params["embed"],
        "layers": [],
        "final_norm": dict(params["final_norm"]),
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(
            np.asarray(params["lm_head"], np.float32), bits=bits, group_size=group_size
        )
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for li, layer in enumerate(params["layers"]):
        st = stats[li]
        attn = {k: np.asarray(v, np.float32) for k, v in layer["attn"].items()}
        mlp = {k: np.asarray(v, np.float32) for k, v in layer["mlp"].items()}

        # q/k/v share the attn_norm input → one scale folded into the norm
        s_qkv = awq_search_scale(
            [attn["q"], attn["k"], attn["v"]],
            st["attn_in"]["mean_abs"], st["attn_in"]["gram"], bits, group_size,
        )
        # o's input is the attention context; share the scale across GQA
        # query groups so it folds into v's output channels
        ma_o = st["o_in"]["mean_abs"].reshape(hkv, h // hkv, hd).mean(axis=1)
        ma_o = np.repeat(ma_o[:, None, :], h // hkv, axis=1).reshape(h * hd)
        s_o = awq_search_scale(
            [attn["o"]], ma_o, st["o_in"]["gram"], bits, group_size,
        )
        s_o_v = s_o.reshape(hkv, h // hkv, hd)[:, 0, :].reshape(hkv * hd)
        # gate/up share mlp_norm's input
        s_gu = awq_search_scale(
            [mlp["gate"], mlp["up"]],
            st["mlp_in"]["mean_abs"], st["mlp_in"]["gram"], bits, group_size,
        )
        # down's input is silu(gate)·up → scale folds into up's output
        s_down = awq_search_scale(
            [mlp["down"]], st["down_in"]["mean_abs"], st["down_in"]["gram"],
            bits, group_size,
        )

        def q(w):
            return quantize_tensor(w, bits=bits, group_size=group_size)

        norm_dtype = np.asarray(layer["attn_norm"]["scale"]).dtype
        out["layers"].append({
            "attn_norm": {"scale": jnp.asarray(
                np.asarray(layer["attn_norm"]["scale"], np.float32) / s_qkv, norm_dtype)},
            "attn": {
                "q": q(attn["q"] * s_qkv[:, None]),
                "k": q(attn["k"] * s_qkv[:, None]),
                # v: input scaled by s_qkv, output channels carry 1/s_o
                "v": q((attn["v"] * s_qkv[:, None]) / s_o_v[None, :]),
                "o": q(attn["o"] * s_o[:, None]),
            },
            "mlp_norm": {"scale": jnp.asarray(
                np.asarray(layer["mlp_norm"]["scale"], np.float32) / s_gu, norm_dtype)},
            "mlp": {
                "gate": q(mlp["gate"] * s_gu[:, None]),
                # up: input scaled by s_gu, output channels carry 1/s_down
                "up": q((mlp["up"] * s_gu[:, None]) / s_down[None, :]),
                "down": q(mlp["down"] * s_down[:, None]),
            },
        })
    logger.info("AWQ-quantized %d layers (int%d, group %d)", len(out["layers"]), bits, group_size)
    return out


# ---------------------------------------------------------------------------
# GPTQ: error-compensated rounding
# ---------------------------------------------------------------------------

def gptq_quantize_tensor(
    w: np.ndarray, gram: np.ndarray, bits: int, group_size: int, damp: float = 0.01,
) -> QuantizedTensor:
    """Column-serial GPTQ: quantize input-dim rows in order, pushing each
    row's rounding error onto the not-yet-quantized rows via the Cholesky
    factor of the inverse (damped) Hessian."""
    w = np.asarray(w, np.float64).copy()
    kin, kout = w.shape
    qmax = 7 if bits == 4 else (1 << (bits - 1)) - 1
    g = group_size if (kin % group_size == 0 and not (bits == 4 and kin % 2)) else kin
    ngroups = kin // g

    H = np.asarray(gram, np.float64).copy()
    dead = np.diag(H) <= 0
    H[dead, dead] = 1.0
    w[dead, :] = 0.0
    H += np.eye(kin) * damp * float(np.mean(np.diag(H)))
    Hinv = np.linalg.inv(H)
    # upper factor U with Hinv = Uᵀ U (torch cholesky(upper=True) convention)
    U = np.linalg.cholesky(Hinv).T

    codes = np.zeros((kin, kout), np.int8)
    scales = np.zeros((ngroups, kout), np.float32)
    for i in range(kin):
        gi = i // g
        if i % g == 0:
            # group scales from the CURRENT (error-updated) rows
            amax = np.max(np.abs(w[i : i + g]), axis=0)
            scales[gi] = np.maximum(amax, 1e-12) / qmax
        qrow = np.clip(np.round(w[i] / scales[gi]), -qmax, qmax)
        codes[i] = qrow.astype(np.int8)
        err = (w[i] - qrow * scales[gi]) / U[i, i]
        if i + 1 < kin:
            w[i + 1 :] -= np.outer(U[i, i + 1 :], err)
    return tensor_from_int_codes(codes, scales, bits, g)


def gptq_quantize_params(
    params, cfg: TransformerConfig, stats, bits: int = 4, group_size: int = 128,
) -> Dict[str, Any]:
    out = {
        "embed": params["embed"],
        "layers": [],
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(
            np.asarray(params["lm_head"], np.float32), bits=bits, group_size=group_size
        )
    site_of = {"q": "attn_in", "k": "attn_in", "v": "attn_in", "o": "o_in",
               "gate": "mlp_in", "up": "mlp_in", "down": "down_in"}
    for li, layer in enumerate(params["layers"]):
        st = stats[li]
        new_layer = {"attn_norm": layer["attn_norm"], "mlp_norm": layer["mlp_norm"],
                     "attn": {}, "mlp": {}}
        for grp in ("attn", "mlp"):
            for name, w in layer[grp].items():
                gram = st[site_of[name]]["gram"]
                new_layer[grp][name] = gptq_quantize_tensor(
                    np.asarray(w, np.float32), gram, bits, group_size
                )
        out["layers"].append(new_layer)
    logger.info("GPTQ-quantized %d layers (int%d, group %d)", len(out["layers"]), bits, group_size)
    return out


# ---------------------------------------------------------------------------
# Front door
# ---------------------------------------------------------------------------

def quantize_params_calibrated(
    params,
    cfg: TransformerConfig,
    method: str,
    calib_batches: Sequence[Tuple[np.ndarray, np.ndarray]],
    bits: int = 4,
    group_size: int = 128,
) -> Dict[str, Any]:
    """Quantize a params pytree with calibration (method: 'awq' | 'gptq')."""
    stats = collect_calibration_stats(params, cfg, calib_batches)
    if method == "awq":
        return awq_quantize_params(params, cfg, stats, bits, group_size)
    if method == "gptq":
        return gptq_quantize_params(params, cfg, stats, bits, group_size)
    raise ValueError(f"unknown calibrated method: {method}")
