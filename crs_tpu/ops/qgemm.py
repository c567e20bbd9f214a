"""Pallas int4 weight-only matmul: the decode-path bandwidth kernel.

The XLA int4 path (``crs_tpu.models.quantized.qmatmul``) dequantizes the
packed weight into a full bf16 matrix before the dot — XLA materializes that
matrix in HBM, so a "4-bit" decode step actually moves ~4x the packed bytes
(packed read + bf16 write + bf16 read). This kernel is the reason int4
exists: each grid step DMAs one *packed* [Kt/2, Nt] int8 block into VMEM,
unpacks the nibbles on the VPU, and contracts on the MXU's native int8 path —
HBM sees only the 4-bit bytes, halving the weight-read floor of the int8
decode path (the reference's analogous win is auto-gptq's fused CUDA
dequant-GEMV, ``models/gptq_model.py:75-84``).

Layout trick (no sublane shuffles): ``quantize_tensor`` packs weight row
``2i`` in the lo nibble and row ``2i+1`` in the hi nibble of packed row
``i``. Splitting the *activation* columns into even/odd planes outside the
kernel (cheap — activations are tiny at decode) makes the contraction two
straight int8 dots per group:

    out = Σ_g [ (x_even_g · lo_g) + (x_odd_g · hi_g) ] · wscale_g · xscale

so the kernel never interleaves the unpacked rows back into weight order.

Activations are dynamically quantized to int8 per row (same recipe as the
int8 path); group scales are applied as an f32 fixup on the [Rt, Nt]
accumulator — full f32 scale precision, no [Kt, Nt] dequant multiply.

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

__all__ = ["q4_matmul", "q4_pallas_supported", "emulate_q4_matmul"]


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


def _q4_kernel(xe_ref, xo_ref, xs_ref, codes_ref, scales_ref, out_ref, *, gpt: int, gs2: int):
    # scales_ref holds ALL groups × the current N-tile (a [G, Nt] block —
    # a [gpt, Nt] block would violate the TPU sublane-divisibility rule for
    # small gpt); rows for this K-step are selected by program id.
    kstep = pl.program_id(2)
    packed = codes_ref[:]  # [Kt2, Nt] int8
    # nibble unpack in int32: Mosaic has no int8 vector shifts (arith.shli
    # on i8 fails to legalize); widen → shift → truncate is legal and the
    # values are bit-identical
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.int8)  # rows 2i (sign-extended)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)  # rows 2i+1 (arithmetic shift)
    rt = xe_ref.shape[0]
    nt = packed.shape[1]
    acc = jnp.zeros((rt, nt), jnp.float32)
    for grp in range(gpt):
        lo_g = jax.lax.slice_in_dim(lo, grp * gs2, (grp + 1) * gs2, axis=0)
        hi_g = jax.lax.slice_in_dim(hi, grp * gs2, (grp + 1) * gs2, axis=0)
        pe = jax.lax.dot_general(
            xe_ref[:, grp * gs2:(grp + 1) * gs2], lo_g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        po = jax.lax.dot_general(
            xo_ref[:, grp * gs2:(grp + 1) * gs2], hi_g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + (pe + po).astype(jnp.float32) * scales_ref[kstep * gpt + grp, :][None, :]
    acc = acc * xs_ref[:]  # [Rt, 1] per-row activation scales

    @pl.when(kstep == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kstep > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _quantize_rows(x2: jax.Array):
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    xs = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _q4_forward(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    r, k = x2.shape
    k2, n = codes.shape
    g = scales.shape[0]
    cfg = _tile_config(k2, n, g)
    assert cfg is not None, "caller must gate on q4_pallas_supported"
    gpt, nt = cfg
    gs2 = k2 // g
    kt2 = gpt * gs2

    xq, xs = _quantize_rows(x2)
    x3 = xq.reshape(r, k2, 2)
    xe, xo = x3[:, :, 0], x3[:, :, 1]  # even/odd weight-row planes

    rt = min(256, _round_up(r, 32))  # int8 sublane tile
    rp = _round_up(r, rt)
    if rp != r:
        pad = ((0, rp - r), (0, 0))
        xe, xo = jnp.pad(xe, pad), jnp.pad(xo, pad)
        xs = jnp.pad(xs, ((0, rp - r), (0, 0)))

    grid = (rp // rt, n // nt, k2 // kt2)
    out = pl.pallas_call(
        partial(_q4_kernel, gpt=gpt, gs2=gs2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, kt2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt2, nt), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nt), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, nt), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), jnp.float32),
        interpret=_interpret(),
    )(xe, xo, xs, codes, scales)
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


def emulate_q4_matmul(x2: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """XLA emulation of the kernel's exact arithmetic (int8 activation quant,
    int32 dot, f32 group-scale fixup) — the parity oracle for tests."""
    xq, xs = _quantize_rows(x2)
    w_int = jnp.stack(
        [jnp.right_shift(jnp.left_shift(codes, 4), 4), jnp.right_shift(codes, 4)], axis=1
    ).reshape(2 * codes.shape[0], codes.shape[1])
    g = scales.shape[0]
    k = 2 * codes.shape[0]
    gs = k // g
    xg = xq.reshape(xq.shape[0], g, gs)
    wg = w_int.reshape(g, gs, w_int.shape[1])
    parts = jnp.einsum("rgk,gkn->rgn", xg.astype(jnp.int32), wg.astype(jnp.int32))
    out = jnp.sum(parts.astype(jnp.float32) * scales[None, :, :], axis=1)
    return out * xs
