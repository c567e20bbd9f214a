"""Fused SwiGLU MLP decode block: one Pallas kernel, manual weight streaming.

VERDICT r2 weak #7 experiment ("fused decode-layer"): at decode batch sizes
every projection is weight-streaming-bound, and the shipped XLA int8 path
already streams at ~990 GB/s — but pays a kernel/fusion boundary per
projection and re-materializes the [B, I] gate/up activations in HBM
between them. This kernel computes

    y = x + W_down( silu(W_gate xn) * W_up xn ),   xn = rmsnorm(x) * g

in ONE kernel invocation: the three weight stacks stream HBM->VMEM with
explicitly double-buffered async DMAs (pallas_guide "Double Buffering"),
chunked on the intermediate dimension I so every DMA is contiguous, and the
[B, ck] intermediates never leave VMEM. Whether this beats three XLA GEMVs
is an empirical question (the automatic-pipeline Pallas decode-row kernels
measured ~350 GB/s vs XLA's ~990 — tools/bench_chain_gemv.py's ``pldb``
variant measures the manual-DMA streaming rate in isolation, and
tools/bench_fused_mlp.py measures this kernel against the XLA path).

Weight layout (kernel-native, produced by :func:`fused_mlp_layout`):
- ``gate_t``/``up_t``: [I, H] int8 (TRANSPOSED vs QuantizedTensor's [H, I])
  with per-I row scales — chunking I rows keeps DMAs contiguous.
- ``down``: [I, H] int8 (QuantizedTensor's natural [K, N] layout) with
  per-H output scales applied once at the end.

Activation handling mirrors ``quantized._int8_act_matmul``: xn is
dynamically quantized to int8 per row (int8 x int8 on the MXU); the hidden
``h = silu(g) * u`` is likewise re-quantized before the down projection.

Reference analog: the fused CUDA MLP epilogues of auto-gptq/AWQ kernels
(reference ``models/gptq_model.py:75-84`` delegates to such kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mlp_int8", "fused_mlp_layout", "fused_mlp_supported"]

_ROWS = 8  # padded decode-row tile (sublane width)


def fused_mlp_supported(batch: int, hidden: int, inter: int, chunk: int = 1024) -> bool:
    """Shape gate: decode-sized batch, lane-aligned dims, chunkable I."""
    return batch <= _ROWS and hidden % 128 == 0 and inter % chunk == 0


def fused_mlp_layout(gate_codes, gate_scales, up_codes, up_scales,
                     down_codes, down_scales, chunk: int = 1024):
    """QuantizedTensor int8 layout -> kernel-native streaming layout.

    Inputs are the stored [K, N] codes: gate/up [H, I] + scales [I],
    down [I, H] + scales [H]. Returns (gate_t, s_gate2, up_t, s_up2, down,
    s_down) with gate/up transposed to [I, H] and per-I scales reshaped to
    [I // chunk, chunk] so the kernel indexes them by chunk id (dynamic
    LANE-dim starts inside a kernel are alignment-restricted; a major-dim
    index is not)."""
    inter = gate_codes.shape[1]
    nchunks = inter // chunk
    gate_t = gate_codes.T.copy() if hasattr(gate_codes, 'copy') else gate_codes.T
    up_t = up_codes.T.copy()
    return (
        gate_t, gate_scales.reshape(nchunks, chunk),
        up_t, up_scales.reshape(nchunks, chunk),
        down_codes, down_scales,
    )


def _kernel(x_ref, g_ref, sg_ref, sd_ref, gate_hbm, up_hbm, down_hbm,
            out_ref, *, chunk: int, eps: float, nchunks: int):
    """x_ref [8, H] f32 VMEM; g_ref [1, H] norm scale; sg_ref [2, nc, ck]
    (gate/up row scales); sd_ref [1, H] down scales; weights in HBM;
    out [8, H] f32."""
    h = x_ref.shape[1]

    def body(bufs, y_acc, sems):
        x = x_ref[:]
        xn = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)
        xn = xn * g_ref[0][None, :]
        # dynamic per-row int8 activation quantization (parity with
        # quantized._int8_act_matmul)
        amax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
        xs = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xn / xs), -127, 127).astype(jnp.int8)

        def dma(which, hbm, slot, ci):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(ci * chunk, chunk)],
                bufs.at[which, slot],
                sems.at[which, slot],
            )

        for w, hbm in enumerate((gate_hbm, up_hbm, down_hbm)):
            dma(w, hbm, 0, 0).start()

        y_acc[...] = jnp.zeros_like(y_acc)

        def loop(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < nchunks)
            def _():
                for w, hbm in enumerate((gate_hbm, up_hbm, down_hbm)):
                    dma(w, hbm, (ci + 1) % 2, ci + 1).start()

            for w, hbm in enumerate((gate_hbm, up_hbm, down_hbm)):
                dma(w, hbm, slot, ci).wait()
            gate_c = bufs[0, slot]  # [ck, H] int8
            up_c = bufs[1, slot]
            down_c = bufs[2, slot]
            acc_g = jax.lax.dot_general(
                xq, gate_c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [8, ck]
            acc_u = jax.lax.dot_general(
                xq, up_c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            g = acc_g * xs * sg_ref[0, ci][None, :]
            u = acc_u * xs * sg_ref[1, ci][None, :]
            hmid = jax.nn.sigmoid(g) * g * u  # silu(g) * u, [8, ck] f32
            # re-quantize the hidden rows (per row, over this chunk only —
            # the down dot is a SUM over chunks, so per-chunk scales stay
            # exact: each partial product carries its own scale)
            hmax = jnp.max(jnp.abs(hmid), axis=1, keepdims=True)
            hs = jnp.maximum(hmax, 1e-12) / 127.0
            hq = jnp.clip(jnp.round(hmid / hs), -127, 127).astype(jnp.int8)
            acc_d = jax.lax.dot_general(
                hq, down_c, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [8, H]
            y_acc[...] = y_acc[...] + acc_d * hs
            return 0

        jax.lax.fori_loop(0, nchunks, loop, 0)
        out_ref[...] = x + y_acc[...] * sd_ref[0][None, :]

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((3, 2, chunk, h), jnp.int8),
        y_acc=pltpu.VMEM((_ROWS, h), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((3, 2)),
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("chunk", "eps"))
def fused_mlp_int8(
    x: jax.Array,          # [B, H] residual stream (B <= 8)
    norm_scale: jax.Array,  # [H]
    gate_t: jax.Array,     # [I, H] int8
    s_gate2: jax.Array,    # [I // chunk, chunk] f32
    up_t: jax.Array,       # [I, H] int8
    s_up2: jax.Array,      # [I // chunk, chunk] f32
    down: jax.Array,       # [I, H] int8
    s_down: jax.Array,     # [H] f32
    chunk: int = 1024,
    eps: float = 1e-5,
) -> jax.Array:
    """One fused decode MLP block: returns x + SwiGLU-MLP(rmsnorm(x))."""
    b, h = x.shape
    inter = gate_t.shape[0]
    nchunks = inter // chunk
    xp = jnp.pad(x.astype(jnp.float32), ((0, _ROWS - b), (0, 0)))
    sg = jnp.stack([s_gate2, s_up2])  # [2, nc, ck]
    out = pl.pallas_call(
        partial(_kernel, chunk=chunk, eps=eps, nchunks=nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # norm scale [1, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gate/up scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # down scales [1, H]
            pl.BlockSpec(memory_space=pl.ANY),       # gate_t (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # up_t (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # down (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, h), jnp.float32),
        interpret=_interpret(),
        # 100 MB Mosaic VMEM budget: the platform AOT path's 16 MB scoped
        # default rejects grouped/double-buffered kernels (see pallas_scan)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, norm_scale.reshape(1, h).astype(jnp.float32), sg,
      s_down.reshape(1, h).astype(jnp.float32), gate_t, up_t, down)
    return out[:b]
