"""Weight-only quantized tensors for the model zoo.

The TPU-native equivalent of the reference's quantized-model dependency
kernels (auto-gptq / autoawq / hqq CUDA, ``models/{gptq,awq,hqq}_model.py``):
weight matrices become :class:`QuantizedTensor` pytree nodes — int8
per-output-channel or int4 group-wise symmetric — and every matmul in the
transformer goes through :func:`qmatmul`, which dispatches on the weight
type. Like HQQ (reference ``models/hqq_model.py:100-134``), quantization is
performed on the fly from full-precision weights, with configurable bit-width
and group size.

int8 uses the MXU's native int8 path with dynamic per-row activation
quantization; int4 is stored packed two-nibbles-per-int8 and unpacked into
the matmul (XLA fuses the unpack/dequant into the GEMM).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QuantizedTensor", "qmatmul", "quantize_tensor", "quantize_params", "params_num_bytes"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """A quantized weight [in, out].

    int8: ``codes`` [in, out] int8, ``scales`` [out] — per output channel.
    int4: ``codes`` [in/2, out] int8 (two nibbles packed per byte along the
    input dim), ``scales`` [in/group_size, out] — group-wise.
    nf4 (``bits="nf4"``): ``codes`` [in/2, out] uint8 — two UNSIGNED nibble
    indices into the 16-entry NF4 codebook (``ops.qgemm.NF4_LEVELS``) —
    with group-wise absmax ``scales``; the true-nonuniform equivalent of the
    reference's bitsandbytes NF4 column (``models/huggingface_model.py:59``).
    ``bits``/``group_size``/``shape`` are static pytree aux data.
    """

    codes: jax.Array
    scales: jax.Array
    bits: int | str
    group_size: int
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.codes, self.scales), (self.bits, self.group_size, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scales = children
        bits, group_size, shape = aux
        return cls(codes, scales, bits, group_size, shape)

    @property
    def dtype(self):
        return jnp.bfloat16

    def unpack_codes(self) -> jax.Array:
        """int4 only: unpack [in/2, out] nibbles → [in, out] int8 in [-7, 7]."""
        lo = jnp.left_shift(self.codes, 4)
        lo = jnp.right_shift(lo, 4)  # arithmetic shift restores sign
        hi = jnp.right_shift(self.codes, 4)
        kin = self.shape[0]
        return jnp.stack([lo, hi], axis=1).reshape(kin, self.shape[1])

    def dequantize(self) -> jax.Array:
        kin, kout = self.shape
        if self.bits == 8:
            return self.codes.astype(jnp.float32) * self.scales[None, :]
        if self.bits == "nf4":
            from ..ops.qgemm import NF4_LEVELS

            p32 = self.codes.astype(jnp.int32)
            lut = jnp.asarray(NF4_LEVELS)
            lo = jnp.take(lut, p32 & 0xF)
            hi = jnp.take(lut, jnp.right_shift(p32, 4) & 0xF)
            vals = jnp.stack([lo, hi], axis=1).reshape(kin, kout)
        else:
            vals = (
                self.unpack_codes() if self.bits == 4 else self.codes
            ).astype(jnp.float32)
        g = self.scales.shape[0]
        grouped = vals.reshape(g, kin // g, kout)
        return (grouped * self.scales[:, None, :]).reshape(kin, kout)


def quantize_tensor(w, bits: int = 8, group_size: int = 128) -> QuantizedTensor:
    """On-the-fly weight quantization, computed HOST-side (numpy).

    Per-matrix eager jnp ops would each compile a separate program — dozens
    of 20-40s remote compiles when quantizing a full model on the axon
    tunnel. numpy round is round-half-even like XLA's.
    """
    w = np.asarray(w, np.float32)
    kin, kout = w.shape
    if bits == 8:
        amax = np.max(np.abs(w), axis=0)
        scales = np.maximum(amax, 1e-12) / 127.0
        codes = np.clip(np.round(w / scales[None, :]), -127, 127).astype(np.int8)
        return QuantizedTensor(
            jnp.asarray(codes), jnp.asarray(scales.astype(np.float32)), 8, 0, (kin, kout)
        )
    if bits == 4:
        if kin % group_size != 0 or kin % 2 != 0:
            group_size = kin if kin % 2 == 0 else 0
        if group_size == 0:
            raise ValueError("int4 requires an even input dim")
        g = kin // group_size
        grouped = w.reshape(g, group_size, kout)
        amax = np.max(np.abs(grouped), axis=1)
        scales = np.maximum(amax, 1e-12) / 7.0
        vals = np.clip(np.round(grouped / scales[:, None, :]), -7, 7).astype(np.int8)
        vals = vals.reshape(kin, kout)
        # pack two int4 values per int8 along the input dim
        pairs = vals.reshape(kin // 2, 2, kout)
        lo = pairs[:, 0, :] & 0x0F
        hi = np.left_shift(pairs[:, 1, :].astype(np.int16), 4).astype(np.int16)
        packed = (lo.astype(np.int16) | hi).astype(np.int8)
        return QuantizedTensor(
            jnp.asarray(packed), jnp.asarray(scales.astype(np.float32)), 4, group_size, (kin, kout)
        )
    if bits == "nf4":
        # nonuniform 4-bit: per-group absmax normalization to [-1, 1], then
        # nearest-of-16 NF4 levels (QLoRA); indices packed two per byte like
        # int4 so the Pallas decode kernel shares the even/odd-plane layout
        from ..ops.qgemm import NF4_LEVELS

        if kin % group_size != 0 or kin % 2 != 0:
            group_size = kin if kin % 2 == 0 else 0
        if group_size == 0:
            raise ValueError("nf4 requires an even input dim")
        g = kin // group_size
        grouped = w.reshape(g, group_size, kout)
        amax = np.max(np.abs(grouped), axis=1)
        scales = np.maximum(amax, 1e-12)
        norm = grouped / scales[:, None, :]  # in [-1, 1]
        mids = (NF4_LEVELS[1:] + NF4_LEVELS[:-1]) / 2.0
        idx = np.searchsorted(mids, norm).astype(np.uint8)  # nearest level
        idx = idx.reshape(kin, kout)
        pairs = idx.reshape(kin // 2, 2, kout)
        packed = (pairs[:, 0, :] | np.left_shift(pairs[:, 1, :], 4)).astype(np.uint8)
        return QuantizedTensor(
            jnp.asarray(packed), jnp.asarray(scales.astype(np.float32)),
            "nf4", group_size, (kin, kout),
        )
    if bits in (2, 3):
        # extreme low-bit group-wise symmetric (reference HQQ nbits ∈ {2,3},
        # models/hqq_model.py:104-110); stored unpacked in int8
        if kin % group_size != 0:
            group_size = kin
        g = kin // group_size
        qmax = (1 << (bits - 1)) - 1  # 1 for 2-bit, 3 for 3-bit
        grouped = w.reshape(g, group_size, kout)
        amax = np.max(np.abs(grouped), axis=1)
        scales = np.maximum(amax, 1e-12) / qmax
        vals = np.clip(np.round(grouped / scales[:, None, :]), -qmax, qmax).astype(np.int8)
        return QuantizedTensor(
            jnp.asarray(vals.reshape(kin, kout)),
            jnp.asarray(scales.astype(np.float32)), bits, group_size, (kin, kout),
        )
    raise ValueError(f"unsupported bits: {bits}")


def tensor_from_int_codes(
    vals: np.ndarray, scales: np.ndarray, bits: int, group_size: int
) -> QuantizedTensor:
    """Build a QuantizedTensor from precomputed integer codes + group scales
    (the GPTQ/AWQ calibrated quantizers produce these); packs int4 nibbles
    identically to :func:`quantize_tensor`."""
    kin, kout = vals.shape
    vals = np.asarray(vals, np.int8)
    scales = np.asarray(scales, np.float32)
    if bits == 4:
        pairs = vals.reshape(kin // 2, 2, kout)
        lo = pairs[:, 0, :] & 0x0F
        hi = np.left_shift(pairs[:, 1, :].astype(np.int16), 4).astype(np.int16)
        packed = (lo.astype(np.int16) | hi).astype(np.int8)
        return QuantizedTensor(jnp.asarray(packed), jnp.asarray(scales), 4, group_size, (kin, kout))
    if bits in (2, 3):
        return QuantizedTensor(jnp.asarray(vals), jnp.asarray(scales), bits, group_size, (kin, kout))
    raise ValueError(f"unsupported bits for int-code tensors: {bits}")


@jax.custom_vjp
def _int8_act_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """Forward: dynamic per-row activation int8 × int8 weight on the MXU.

    Backward (custom VJP): dense gradient through the dequantized weight —
    ``round()`` in the activation quantizer would otherwise zero all
    gradients flowing through quantized layers (QLoRA training would only
    learn through the adapter delta of the last layer).
    """
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, codes,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * scales[None, :]


def _int8_act_matmul_fwd(x2, codes, scales):
    return _int8_act_matmul(x2, codes, scales), (codes, scales)


def _int8_act_matmul_bwd(res, g):
    codes, scales = res
    w = codes.astype(jnp.float32) * scales[None, :]
    dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32)
    d_codes = np.zeros(codes.shape, jax.dtypes.float0)  # int leaf: zero tangent
    d_scales = jnp.zeros_like(scales)
    return dx, d_codes, d_scales


_int8_act_matmul.defvjp(_int8_act_matmul_fwd, _int8_act_matmul_bwd)


def qmatmul(x: jax.Array, w: Any) -> jax.Array:
    """x @ w where w is a plain array, a QuantizedTensor, or a LoRAWeight."""
    if type(w).__name__ == "LoRAWeight":  # avoid circular import
        from ..finetuning.lora import apply_lora_matmul

        return apply_lora_matmul(x, w)
    if isinstance(w, QuantizedTensor):
        if w.bits == 8:
            xf = x.astype(jnp.float32)
            x2 = xf.reshape(-1, xf.shape[-1])
            out = _int8_act_matmul(x2, w.codes, w.scales)
            return out.reshape(*x.shape[:-1], -1).astype(x.dtype)
        if w.bits in (4, "nf4"):
            from ..ops.qgemm import nf4_matmul, q4_matmul, q4_pallas_supported

            x2 = x.reshape(-1, x.shape[-1])
            k2, n = w.codes.shape
            if q4_pallas_supported(x2.shape[0], k2, n, w.scales.shape[0]):
                # decode-sized row counts: fused Pallas kernel — HBM reads
                # only the packed nibbles (half the int8 path's bytes); nf4
                # adds the in-kernel 16-entry LUT (select tree)
                mm = nf4_matmul if w.bits == "nf4" else q4_matmul
                out = mm(x2, w.codes, w.scales)
                return out.reshape(*x.shape[:-1], -1).astype(x.dtype)
        # int4 group-wise at large row counts (MXU-bound — unpack+dequantize
        # into the GEMM, XLA fuses) and int2/int3: dequantized dot; fully
        # differentiable through x since codes are constants.
        return jnp.dot(x, w.dequantize().astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


_QUANT_SKIP = ("embed", "scale", "norm")


def quantize_params(params: Dict[str, Any], bits: int = 8, group_size: int = 128) -> Dict[str, Any]:
    """Quantize every 2-D weight matrix in a params pytree (norms/embeddings
    stay full precision, like the reference's quantized models keep
    embeddings and norms in fp16)."""

    def visit(path: str, node: Any) -> Any:
        if isinstance(node, dict):
            return {k: visit(f"{path}.{k}", v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(f"{path}[{i}]", v) for i, v in enumerate(node)]
        if isinstance(node, jax.Array) and node.ndim == 2 and not any(s in path for s in _QUANT_SKIP):
            return quantize_tensor(node, bits=bits, group_size=group_size)
        return node

    return visit("", params)


def params_num_bytes(params: Any) -> int:
    """Total parameter bytes (packed int4 counts at its stored width)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total
