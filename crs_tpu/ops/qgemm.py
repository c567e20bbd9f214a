"""Pallas int4 weight-only matmul: the int4 decode kernel.

The XLA int4 path (``crs_tpu.models.quantized.qmatmul``) dequantizes the
packed weight into a full bf16 matrix before the dot — XLA materializes that
matrix in HBM, so a "4-bit" decode step actually moves ~4x the packed bytes
(packed read + bf16 write + bf16 read; measured 37 GB/s effective in a
chained decode-realistic bench, ``tools/bench_chain_gemv.py``). This kernel
DMAs one *packed* [Kt/2, Nt] int8 block into VMEM per grid step, unpacks the
nibbles on the VPU, and contracts on the MXU — 186 GB/s effective, 5x the
XLA dequant path, and the best int4 decode path available.

Measured ceiling (v5e, round 2.5): it does NOT beat the int8 decode path in
wall time. XLA's M<=8 int8 GEMV streams weights at ~990 GB/s (HBM rate),
while a Pallas kernel whose dot runs on the MXU is weight-load bound at
~350 GB/s for decode-sized row tiles regardless of dtype — so halved HBM
bytes lose to a 3x slower consumer. Native XLA s4 dots fail to compile on
the axon platform, and a VPU-only multiply-reduce GEMV pencils out worse at
batch>1 (unpack cost scales per row). int4's value on TPU is therefore
**2x weight memory** (serve twice the parameters per chip) at ~1.3x the
int8 per-token latency — unlike the reference's T4, where auto-gptq's fused
CUDA dequant-GEMV (``models/gptq_model.py:75-84``) is itself the fast path.

Layout trick (no sublane shuffles): ``quantize_tensor`` packs weight row
``2i`` in the lo nibble and row ``2i+1`` in the hi nibble of packed row
``i``. Splitting the *activation* columns into even/odd planes outside the
kernel (cheap — activations are tiny at decode) makes the contraction two
straight full-tile dots:

    out = x_even · (lo · scale_rep) + x_odd · (hi · scale_rep)

so the kernel never interleaves the unpacked rows back into weight order.
Group scales are folded into the bf16 weight tiles via a sublane repeat —
measured faster on v5e than per-group int8 dots with f32 fixups (the small
[Rt, gs/2] dots dominated, not the VPU dequant).

On non-TPU backends the kernel runs in Pallas interpret mode (CI-testable on
the CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "q4_matmul", "q4_pallas_supported", "emulate_q4_matmul",
    "nf4_matmul", "emulate_nf4_matmul", "NF4_LEVELS",
]

# bitsandbytes' NF4 codebook: the 16 quantile-optimal levels of a standard
# normal, normalized to [-1, 1] (QLoRA paper table; the reference consumes it
# via BitsAndBytesConfig(load_in_4bit, bnb_4bit_quant_type="nf4") —
# /root/reference/models/huggingface_model.py:59). Nonuniform: dequant is a
# 16-entry LUT, not a scale multiply.
NF4_LEVELS = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_config(k2: int, n: int, g: int):
    """Pick (groups_per_tile, Nt) or None if the shapes don't map to tiles.

    Constraints: packed K-tile ``gpt·gs2`` must be a lane-aligned multiple of
    128 that divides K/2; N must split into 128-aligned tiles (weights are
    never padded — padding would copy the whole matrix every call).
    """
    if k2 <= 0 or n % 128 != 0 or k2 % g != 0:
        return None
    gs2 = k2 // g
    gpt = 0
    for cand in range(g, 0, -1):
        if g % cand == 0 and cand * gs2 <= 512 and (cand * gs2) % 128 == 0:
            gpt = cand
            break
    if gpt == 0:
        return None
    nt = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    return gpt, nt


def q4_pallas_supported(rows: int, k2: int, n: int, g: int, max_rows: int = 64) -> bool:
    """True when the fused kernel should take this matmul (decode-sized row
    counts; larger row counts are MXU-bound and the VPU nibble-unpack would
    dominate — XLA's dequant path wins there)."""
    return rows <= max_rows and _tile_config(k2, n, g) is not None


def _q4_kernel(xe_ref, xo_ref, codes_ref, scales_ref, out_ref, *, gpt: int, gs2: int):
    # scales_ref block: [1, gpt_pad8, Nt] — this K-step's group rows,
    # sliced by the BLOCK SPEC (an in-kernel pl.ds row slice would need a
    # statically 8-aligned start, which kstep·gpt isn't for gpt=4), with the
    # group dim padded to the f32 sublane tile.
    kstep = pl.program_id(2)
    packed = codes_ref[:]  # [Kt2, Nt] int8
    # nibble unpack in int32: Mosaic has no int8 vector shifts (arith.shli
    # on i8 fails to legalize); widen → shift → truncate is legal and the
    # values are bit-identical
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)  # rows 2i (sign-extended)
    hi = jnp.right_shift(p32, 4)  # rows 2i+1 (arithmetic shift)
    # fold the group scales into bf16 weights and contract with TWO
    # full-tile dots — measured faster than per-group int8 dots with f32
    # fixups (the small [Rt, gs2] dots dominate, not the VPU)
    sl = scales_ref[0, :gpt, :]  # [gpt, Nt] f32
    # element-repeat each group row gs2 times (pltpu.repeat TILES, which is
    # the wrong semantics): broadcast then collapse the major dims
    rep = jnp.broadcast_to(sl[:, None, :], (gpt, gs2, sl.shape[1]))
    rep = rep.reshape(gpt * gs2, sl.shape[1]).astype(jnp.bfloat16)  # [Kt2, Nt]
    wlo = lo.astype(jnp.bfloat16) * rep
    whi = hi.astype(jnp.bfloat16) * rep
    acc = jax.lax.dot_general(
        xe_ref[:], wlo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xo_ref[:], whi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kstep == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kstep > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _nf4_lookup(idx):
    """16-entry NF4 LUT on a tile of nibble indices (0..15), evaluated as a
    4-level binary select tree (15 tile-selects) — TPU has no lane-crossing
    vector gather, and a one-hot MXU dot per tile would dwarf the weight DMA.
    """
    b = [(jnp.right_shift(idx, i) & 1) == 1 for i in range(4)]
    cur = [jnp.float32(v) for v in NF4_LEVELS]
    for bit in b:
        cur = [jnp.where(bit, cur[2 * i + 1], cur[2 * i])
               for i in range(len(cur) // 2)]
    return cur[0]


def _nf4_kernel(xe_ref, xo_ref, codes_ref, scales_ref, out_ref, *, gpt: int, gs2: int):
    """NF4 variant of :func:`_q4_kernel`: unsigned nibble indices → LUT
    (select tree) → fold group scales → two full-tile MXU dots."""
    kstep = pl.program_id(2)
    p32 = codes_ref[:].astype(jnp.int32)  # uint8 zero-extends
    lo = _nf4_lookup(p32 & 0xF)           # rows 2i
    hi = _nf4_lookup(jnp.right_shift(p32, 4) & 0xF)  # rows 2i+1
    sl = scales_ref[0, :gpt, :]  # [gpt, Nt] f32
    rep = jnp.broadcast_to(sl[:, None, :], (gpt, gs2, sl.shape[1]))
    rep = rep.reshape(gpt * gs2, sl.shape[1]).astype(jnp.bfloat16)
    wlo = lo.astype(jnp.bfloat16) * rep
    whi = hi.astype(jnp.bfloat16) * rep
    acc = jax.lax.dot_general(
        xe_ref[:], wlo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xo_ref[:], whi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kstep == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kstep > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _q4_forward(x2: jax.Array, codes: jax.Array, scales: jax.Array,
                kernel=_q4_kernel) -> jax.Array:
    r, k = x2.shape
    k2, n = codes.shape
    g = scales.shape[0]
    cfg = _tile_config(k2, n, g)
    assert cfg is not None, "caller must gate on q4_pallas_supported"
    gpt, nt = cfg
    gs2 = k2 // g
    kt2 = gpt * gs2

    x3 = x2.astype(jnp.bfloat16).reshape(r, k2, 2)
    xe, xo = x3[:, :, 0], x3[:, :, 1]  # even/odd weight-row planes

    rt = min(256, _round_up(r, 16))  # bf16 sublane tile
    rp = _round_up(r, rt)
    if rp != r:
        pad = ((0, rp - r), (0, 0))
        xe, xo = jnp.pad(xe, pad), jnp.pad(xo, pad)

    # regroup scales per K-step with the group dim padded to the f32 sublane
    # tile (scales are tiny — ≤2 MB even for the LM head — so this per-call
    # reshape costs ~nothing next to the packed-code reads)
    nk = k2 // kt2
    gp8 = _round_up(gpt, 8)
    scales3 = scales.reshape(nk, gpt, n)
    if gp8 != gpt:
        scales3 = jnp.pad(scales3, ((0, 0), (0, gp8 - gpt), (0, 0)))

    grid = (rp // rt, n // nt, nk)
    out = pl.pallas_call(
        partial(kernel, gpt=gpt, gs2=gs2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt2, nt), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp8, nt), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, nt), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xe, xo, codes, scales3)
    return out[:r]


@jax.custom_vjp
def q4_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """x2 [R, K] @ int4-packed weight → [R, N] f32.

    ``codes`` [K/2, N] int8 (two nibbles per byte along K, lo = even row),
    ``scales`` [K/group_size, N] f32 — the :class:`QuantizedTensor` bits=4
    layout. Differentiable in ``x2`` (dense dequant backward, matching the
    int8 path's custom VJP — training never hits the kernel itself).
    """
    return _q4_forward(x2, codes, scales)


def _q4_fwd(x2, codes, scales):
    return _q4_forward(x2, codes, scales), (codes, scales)


def _dequant_w(codes: jax.Array, scales: jax.Array) -> jax.Array:
    k2, n = codes.shape
    g = scales.shape[0]
    lo = jnp.right_shift(jnp.left_shift(codes, 4), 4)
    hi = jnp.right_shift(codes, 4)
    vals = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n).astype(jnp.float32)
    return (vals.reshape(g, (2 * k2) // g, n) * scales[:, None, :]).reshape(2 * k2, n)


def _q4_bwd(res, grad):
    codes, scales = res
    w = _dequant_w(codes, scales)
    dx = jnp.dot(grad, w.T, preferred_element_type=jnp.float32).astype(grad.dtype)
    d_codes = np.zeros(codes.shape, jax.dtypes.float0)  # int leaf: zero tangent
    d_scales = jnp.zeros_like(scales)
    return dx, d_codes, d_scales


q4_matmul.defvjp(_q4_fwd, _q4_bwd)


@jax.custom_vjp
def nf4_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """x2 [R, K] @ NF4-packed weight → [R, N] f32.

    ``codes`` [K/2, N] uint8 (two UNSIGNED nibble indices per byte along K,
    lo = even row), ``scales`` [K/group_size, N] f32 per-group absmax — the
    :class:`QuantizedTensor` bits="nf4" layout. Same decode-row gate as
    :func:`q4_matmul` (``q4_pallas_supported``); same even/odd activation-
    plane trick, plus the in-kernel 16-entry LUT (select tree). TPU-native
    equivalent of bitsandbytes' NF4 dequant-GEMV (reference
    ``models/huggingface_model.py:59`` quantization_config)."""
    return _q4_forward(x2, codes, scales, kernel=_nf4_kernel)


def _nf4_dequant_w(codes: jax.Array, scales: jax.Array) -> jax.Array:
    k2, n = codes.shape
    g = scales.shape[0]
    p32 = codes.astype(jnp.int32)
    lut = jnp.asarray(NF4_LEVELS)
    lo = jnp.take(lut, p32 & 0xF)
    hi = jnp.take(lut, jnp.right_shift(p32, 4) & 0xF)
    vals = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    return (vals.reshape(g, (2 * k2) // g, n) * scales[:, None, :]).reshape(2 * k2, n)


def _nf4_fwd(x2, codes, scales):
    return nf4_matmul(x2, codes, scales), (codes, scales)


def _nf4_bwd(res, grad):
    codes, scales = res
    w = _nf4_dequant_w(codes, scales)
    dx = jnp.dot(grad, w.T, preferred_element_type=jnp.float32).astype(grad.dtype)
    d_codes = np.zeros(codes.shape, jax.dtypes.float0)
    d_scales = jnp.zeros_like(scales)
    return dx, d_codes, d_scales


nf4_matmul.defvjp(_nf4_fwd, _nf4_bwd)


def emulate_nf4_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """XLA emulation of the NF4 kernel's exact arithmetic (bf16 activations,
    LUT values × group scales folded into bf16 weights, f32 accumulation) —
    the parity oracle for tests."""
    p32 = codes.astype(jnp.int32)
    lut = jnp.asarray(NF4_LEVELS)
    lo = jnp.take(lut, p32 & 0xF)
    hi = jnp.take(lut, jnp.right_shift(p32, 4) & 0xF)
    vals = jnp.stack([lo, hi], axis=1).reshape(2 * codes.shape[0], codes.shape[1])
    g = scales.shape[0]
    k = 2 * codes.shape[0]
    gs = k // g
    scale_rows = jnp.repeat(scales, gs, axis=0)
    w = vals.astype(jnp.bfloat16) * scale_rows.astype(jnp.bfloat16)
    return jnp.dot(x2.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


def emulate_q4_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """XLA emulation of the kernel's exact arithmetic (bf16 activations,
    group scales folded into bf16 weights, f32 accumulation) — the parity
    oracle for tests."""
    w_int = jnp.stack(
        [jnp.right_shift(jnp.left_shift(codes, 4), 4), jnp.right_shift(codes, 4)], axis=1
    ).reshape(2 * codes.shape[0], codes.shape[1])
    g = scales.shape[0]
    k = 2 * codes.shape[0]
    gs = k // g
    scale_rows = jnp.repeat(scales, gs, axis=0)  # [K, N]
    w = w_int.astype(jnp.bfloat16) * scale_rows.astype(jnp.bfloat16)
    return jnp.dot(
        x2.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
