#!/usr/bin/env python
"""Compile-and-verify every Pallas kernel family on the REAL chip.

CI runs the kernels in interpret mode on CPU, which checks numerics but not
Mosaic legality — int8 vector shifts, sublane-aligned dynamic slices, and
block-shape rules only fail on the actual TPU lowering (three such failures
were caught by full decode benches in round 2, each costing a ~20-minute
compile cycle). This script compiles one small shape per kernel and checks
output against the XLA oracle. Run it after touching crs_tpu/ops/*.

Usage: python tools/tpu_kernel_smoke.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"ok   {name} ({time.perf_counter()-t0:.0f}s)")
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False


def main() -> int:
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    ok = True

    def scan_fp32():
        from crs_tpu.ops.pallas_scan import pallas_topk

        # fp32 MXU dots are bf16-pass decompositions whose rounding differs
        # between the Pallas kernel and XLA's dot, so near-ties at the k-th
        # rank can swap ids between the two — check against an fp64 host
        # oracle with a score tolerance instead of exact id equality.
        vn = rng.standard_normal((2048, 128)).astype(np.float32)
        qn = rng.standard_normal((8, 128)).astype(np.float32)
        s, i = pallas_topk(jnp.asarray(vn), jnp.asarray(qn), 5, 2000, block_size=1024)
        i = np.asarray(i)
        true = qn.astype(np.float64) @ vn[:2000].astype(np.float64).T  # [8, 2000]
        kth = np.sort(true, axis=1)[:, -5]
        got = np.take_along_axis(true, i, axis=1)
        assert (got >= kth[:, None] - 1e-3).all(), (got, kth)

    def scan_int8():
        from crs_tpu.ops.pallas_scan import pallas_topk_int8
        from crs_tpu.ops.quant import int8_topk, scalar_quantize

        v = rng.standard_normal((2048, 128)).astype(np.float32)
        codes, scales = scalar_quantize(jnp.asarray(v))
        q = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        s, i = pallas_topk_int8(codes, scales, q, 5, 2000, block_size=1024)
        s2, i2 = int8_topk(codes, scales, q, 5, 2000, rescore_k=0)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

    def scan_pq():
        from crs_tpu.ops.pallas_scan import pallas_topk_pq_adc
        from crs_tpu.ops.pq import pq_encode, train_pq

        v = jnp.asarray(rng.standard_normal((2048, 128)).astype(np.float32))
        cb = train_pq(jax.random.PRNGKey(0), v, num_subspaces=8, num_clusters=16, num_iters=3)
        codes = pq_encode(cb, v)
        q = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        s, i = pallas_topk_pq_adc(cb.centroids, codes, q, 5, 2000)
        assert np.asarray(s).shape == (8, 5)

    def q4():
        from crs_tpu.models.quantized import quantize_tensor
        from crs_tpu.ops.qgemm import emulate_q4_matmul, q4_matmul

        # the mlp-down shape: G=44 → gpt=4, whose unaligned scale rows
        # caught a real Mosaic failure
        qt = quantize_tensor(
            rng.standard_normal((5632, 256)).astype(np.float32) * 0.1,
            bits=4, group_size=128,
        )
        x = jnp.asarray(rng.standard_normal((2, 5632)).astype(np.float32))
        got = np.asarray(q4_matmul(x, qt.codes, qt.scales))
        want = np.asarray(emulate_q4_matmul(x, qt.codes, qt.scales))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def nf4():
        from crs_tpu.models.quantized import quantize_tensor
        from crs_tpu.ops.qgemm import emulate_nf4_matmul, nf4_matmul

        # round-5 NF4 kernel: the 4-level select-tree LUT is the new Mosaic
        # surface (uint8 nibble extract + 15 tile-selects per plane)
        qt = quantize_tensor(
            rng.standard_normal((5632, 256)).astype(np.float32) * 0.1,
            bits="nf4", group_size=128,
        )
        x = jnp.asarray(rng.standard_normal((2, 5632)).astype(np.float32))
        got = np.asarray(nf4_matmul(x, qt.codes, qt.scales))
        want = np.asarray(emulate_nf4_matmul(x, qt.codes, qt.scales))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def decode_attn():
        from crs_tpu.ops.decode_attention import (
            decode_attention_int8,
            emulate_decode_attention_int8,
            quantize_kv_rows,
        )

        b, hkv, g, s, hd = 2, 2, 2, 256, 128
        q = jnp.asarray(rng.standard_normal((b, hkv, g, hd)).astype(np.float32))
        kc, ks = quantize_kv_rows(jnp.asarray(rng.standard_normal((b, hkv, s, hd)).astype(np.float32)))
        vc, vs = quantize_kv_rows(jnp.asarray(rng.standard_normal((b, hkv, s, hd)).astype(np.float32)))
        # mask the tail so the additive-bias mask path is exercised
        valid = jnp.asarray((np.arange(s)[None, :] < s - 64).astype(np.int8).repeat(b, 0))
        got = np.asarray(decode_attention_int8(q, kc, ks, vc, vs, valid))
        want = np.asarray(emulate_decode_attention_int8(q, kc, ks, vc, vs, valid))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    def scan_residual_pq():
        from crs_tpu.ops.pallas_scan import pallas_topk_residual_pq_adc
        from crs_tpu.ops.pq import (
            residual_codes_ext, residual_pq_adc_topk, residual_pq_encode,
            train_residual_pq,
        )

        v = jnp.asarray(rng.standard_normal((3000, 64)).astype(np.float32))
        rpq = train_residual_pq(
            jax.random.PRNGKey(1), v, coarse_clusters=256, num_subspaces=8,
            num_clusters=16, num_iters=3, opq_iters=1, coarse_iters=3,
        )
        cids, codes = residual_pq_encode(rpq, v)
        q = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
        s, i = pallas_topk_residual_pq_adc(
            rpq.rotation, rpq.coarse, rpq.codebook.centroids,
            residual_codes_ext(cids, codes), q, 8, 3000, block_size=512,
        )
        s2, i2 = residual_pq_adc_topk(rpq, cids, codes, q, 8, 3000)
        # real-HW bf16 residual dots can swap near-ties vs the f32 oracle;
        # candidates are rescored downstream — require high set overlap
        i, i2 = np.asarray(i), np.asarray(i2)
        overlap = np.mean([len(set(a) & set(b)) / 8 for a, b in zip(i, i2)])
        assert overlap >= 0.85, (overlap, i, i2)

    def scan_grouped_repair():
        """Round-3 forms: grouped grid steps + kb=2 with targeted repair —
        a hot block forces the repair branch to execute ON CHIP (interpret
        mode already covers numerics; this checks the Mosaic lowering of the
        [1, G, kb, qb] grouped output writes and the repair gather)."""
        from crs_tpu.ops.pallas_scan import pallas_topk, pallas_topk_int8
        from crs_tpu.ops.quant import scalar_quantize

        vn = rng.standard_normal((8192, 128)).astype(np.float32)
        qn = rng.standard_normal((8, 128)).astype(np.float32)
        vn[4096:4136] = qn[0][None] * 5  # >kb of q0's top-20 in one block
        s, i = pallas_topk(jnp.asarray(vn), jnp.asarray(qn), 20, 8000,
                           block_size=512, kb=2, group=4, repair=64)
        i = np.asarray(i)
        true = qn.astype(np.float64) @ vn[:8000].astype(np.float64).T
        kth = np.sort(true, axis=1)[:, -20]
        got = np.take_along_axis(true, i, axis=1)
        assert (got >= kth[:, None] - 1e-3).all()
        assert all(len(set(r)) == 20 for r in i), "duplicate ids"
        codes, scales = scalar_quantize(jnp.asarray(vn))
        s8, i8 = pallas_topk_int8(codes, scales, jnp.asarray(qn), 20, 8000,
                                  block_size=512, kb=2, group=4, repair=64)
        i8 = np.asarray(i8)
        assert all(len(set(r)) == 20 for r in i8), "duplicate ids (int8)"
        assert len(set(i8[0][:10]) & set(i[0][:10])) >= 8

    def scan_grouped_adc():
        """Round-4 forms: grouped grid steps on BOTH ADC kernels — checks
        the Mosaic lowering of the [QB, G·BS] one-hot dots and the grouped
        [1, G, kb, qb] output writes; numerics must match the group=1 form
        that scan_pq/scan_residual_pq already verified against XLA."""
        from crs_tpu.ops.pallas_scan import (
            pallas_topk_pq_adc, pallas_topk_residual_pq_adc,
        )
        from crs_tpu.ops.pq import (
            pq_encode, residual_codes_ext, residual_pq_encode, train_pq,
            train_residual_pq,
        )

        v = jnp.asarray(rng.standard_normal((9000, 64)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
        cb = train_pq(jax.random.PRNGKey(2), v, 8, 64, 5)
        codes = pq_encode(cb, v)
        s1, i1 = pallas_topk_pq_adc(cb.centroids, codes, q, 8, 9000,
                                    block_size=512, group=1)
        s4, i4 = pallas_topk_pq_adc(cb.centroids, codes, q, 8, 9000,
                                    block_size=512, group=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i4))
        rpq = train_residual_pq(
            jax.random.PRNGKey(3), v, coarse_clusters=256, num_subspaces=8,
            num_clusters=16, num_iters=3, opq_iters=1, coarse_iters=3,
        )
        cids, rcodes = residual_pq_encode(rpq, v)
        ext = residual_codes_ext(cids, rcodes)
        r1 = pallas_topk_residual_pq_adc(
            rpq.rotation, rpq.coarse, rpq.codebook.centroids, ext, q, 8,
            9000, block_size=512, group=1)
        r4 = pallas_topk_residual_pq_adc(
            rpq.rotation, rpq.coarse, rpq.codebook.centroids, ext, q, 8,
            9000, block_size=512, group=4)
        np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r4[1]))

    def aniso_train():
        """Round-4 aniso codebook training on chip: exercises the batched
        per-codeword [D,D] linalg.solve and the direction-table einsums
        (first on-silicon execution happens here, not in the long curve
        steps — a lowering failure should cost seconds, not a suite slot)."""
        from crs_tpu.ops.pq import (
            pq_encode, residual_pq_encode, train_residual_pq,
        )

        v = jnp.asarray(rng.standard_normal((20000, 64)).astype(np.float32))
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        rpq = train_residual_pq(
            jax.random.PRNGKey(5), v, coarse_clusters=256, num_subspaces=8,
            num_clusters=64, num_iters=4, opq_iters=1, coarse_iters=3,
            aniso_eta=8.0,
        )
        cids, codes = residual_pq_encode(rpq, v, jnp.float32(8.0))
        jax.block_until_ready(codes)
        assert np.isfinite(np.asarray(rpq.codebook.centroids)).all()
        assert np.asarray(codes).max() < 64

    for name, fn in (
        ("pallas_topk(fp32)", scan_fp32),
        ("grouped+repair", scan_grouped_repair),
        ("grouped_adc", scan_grouped_adc),
        ("aniso_train", aniso_train),
        ("pallas_topk_int8", scan_int8),
        ("pallas_topk_pq_adc", scan_pq),
        ("pallas_topk_residual_pq_adc", scan_residual_pq),
        ("q4_matmul", q4),
        ("nf4_matmul", nf4),
        ("decode_attention_int8", decode_attn),
    ):
        ok = check(name, fn) and ok
    print("ALL OK" if ok else "FAILURES", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
