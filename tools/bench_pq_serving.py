#!/usr/bin/env python
"""PQ-only serving at 40M–100M rows on one chip (VERDICT r2 #2 / #9).

The corpus never exists densely anywhere: clustered rows are generated
on-device in 1M-row chunks from deterministic PRNG keys, residual-PQ-encoded
chunk by chunk, and only the [N, M+2] uint8 ext codes persist (M+2 B/vec —
the HBM serving footprint). Exact fp32 ground truth re-generates the same
chunks (same keys) and scans them on device, so a 100M-row corpus (38 GB
dense) is validated end-to-end with ~1.5 GB of HBM and no 60 GB host array.

Modes measured:
- pq_rescore="none": rank by fused-ADC scores alone (M+2 B/vec total).
- pq_rescore="host": top-cand ADC candidates rescored against a host-RAM
  int8 mirror (optional — skipped at 100M unless --host-mirror).

Usage:
  python tools/bench_pq_serving.py --rows 40000000
  python tools/bench_pq_serving.py --rows 100000000 --no-host-mirror
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--cpu" in sys.argv:  # must land before any backend touch: the image's
    # sitecustomize pins jax to the axon TPU tunnel, which HANGS when the
    # tunnel is down — env vars alone cannot override it
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

CHUNK = 1_000_000


def _gen_chunk(key, centers, mix, dim, sigma):
    """[CHUNK, dim] clustered ANISOTROPIC unit rows, fully on device.

    The within-cluster noise goes through a spectral-decay mixing matrix
    (exp(-i/20) eigenspectrum) like the hard corpus of
    tests/test_residual_pq.py — real text embeddings have fast-decaying
    spectra (effective rank ~50-100 for MiniLM-class models); ISOTROPIC
    384-d noise would make within-cluster ranking information-free (every
    margin at noise level: measured recall@10 ~0.10 for ANY 14 B/vec code,
    and ~that for any method at any size)."""
    k1, k2 = jax.random.split(key)
    assign = jax.random.randint(k1, (CHUNK,), 0, centers.shape[0])
    noise = jax.random.normal(k2, (CHUNK, dim), jnp.float32) @ mix
    x = centers[assign] + sigma * noise
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cand", type=int, default=100)
    ap.add_argument("--subspaces", type=int, default=12)
    ap.add_argument("--coarse", type=int, default=2048)
    ap.add_argument("--sigma", type=float, default=0.35)
    ap.add_argument("--host-mirror", dest="host_mirror", action="store_true",
                    default=None)
    ap.add_argument("--no-host-mirror", dest="host_mirror", action="store_false")
    ap.add_argument("--block-size", type=int, default=2048)
    ap.add_argument("--codes-cache", default=None,
                    help="npz path: save/load the encoded ext codes + rpq + "
                         "mirror so a rerun skips the ~minutes-per-10M encode")
    ap.add_argument("--aniso-eta", default="0",
                    help="aniso η for codebook training/encode; 0=isotropic, "
                         "'auto'=ScaNN η(T=0.2, dim) — see ops/pq.py")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke/shape runs)")
    ap.add_argument("--sorted-coarse", action="store_true",
                    help="IVF layout: sort rows by coarse id and scan with "
                         "the per-tile 512-id window kernel (r5)")
    ap.add_argument("--mirror-mmap", default=None,
                    help="back the host rescore mirror with raw memmap "
                         "files at this path prefix (enables host-rescored "
                         "serving at 100M rows: a 38 GB mirror exceeds RAM "
                         "but pages fine from disk)")
    args = ap.parse_args()
    n, d = args.rows, args.dim
    host_mirror = args.host_mirror
    if host_mirror is None:
        host_mirror = n <= 50_000_000
    nchunks = n // CHUNK
    assert n % CHUNK == 0

    from crs_tpu.ops.pallas_scan import pallas_topk_residual_pq_adc
    from crs_tpu.ops.pq import (
        residual_codes_ext, residual_pq_encode, train_residual_pq,
    )

    key = jax.random.PRNGKey(0)
    ck, qk, tk, mk = jax.random.split(key, 4)
    spec = jnp.exp(-jnp.arange(d, dtype=jnp.float32) / 20.0)
    mix = jax.random.normal(mk, (d, d), jnp.float32) * spec[None, :] / d ** 0.5
    centers = jax.random.normal(ck, (args.centers, d), jnp.float32) @ mix * 3.0
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    chunk_keys = jax.random.split(tk, nchunks)

    gen = jax.jit(lambda k: _gen_chunk(k, centers, mix, d, args.sigma))

    # queries: rows of chunk 0 + noise
    t0 = time.perf_counter()
    c0 = gen(chunk_keys[0])
    qn = jax.random.normal(qk, (args.batch, d), jnp.float32)
    queries = c0[: args.batch] + 0.05 * qn
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    m = args.subspaces
    cache = args.codes_cache
    from crs_tpu.ops.pq import PQCodebook, ResidualPQ, aniso_eta_from_threshold

    if args.aniso_eta == "auto":
        eta = aniso_eta_from_threshold(0.2, d)
    else:
        eta = float(args.aniso_eta)
        eta = eta if eta > 1.0 else None

    if cache and Path(cache).exists():
        try:
            data = np.load(cache)
            data["rows"]  # force the zip directory read now
        except Exception as e:  # truncated by a killed run — rebuild
            print(f"codes cache {cache} unreadable ({e}); rebuilding",
                  file=sys.stderr)
            Path(cache).unlink()
            data = None
    else:
        data = None
    if data is not None:
        assert int(data["rows"]) == n and int(data["m"]) == m, "cache mismatch"
        cached_eta = float(data["aniso_eta"]) if "aniso_eta" in data else 0.0
        assert cached_eta == (eta or 0.0), \
            f"cache trained with aniso_eta={cached_eta}, asked {eta or 0.0}"
        rpq = ResidualPQ(rotation=jnp.asarray(data["rotation"]),
                         coarse=jnp.asarray(data["coarse"]),
                         codebook=PQCodebook(jnp.asarray(data["centroids"])))
        ext_host = data["ext"]
        mirror = data["mirror"] if "mirror" in data and host_mirror else None
        mirror_scales = (data["mirror_scales"]
                         if "mirror_scales" in data and host_mirror else None)
        if mirror is None and host_mirror and args.mirror_mmap:
            if Path(args.mirror_mmap + ".codes.i8").exists():
                # memmapped mirror persists as raw files beside the npz cache
                mirror = np.memmap(args.mirror_mmap + ".codes.i8", np.int8,
                                   mode="r", shape=(n, d))
                mirror_scales = np.memmap(args.mirror_mmap + ".scales.f32",
                                          np.float32, mode="r", shape=(n,))
            else:
                # cache predates the mirror (e.g. a --no-host-mirror run):
                # backfill the memmap by regenerating + quantizing chunks —
                # encode is skipped, this is the cheap half
                mirror = np.memmap(args.mirror_mmap + ".codes.i8", np.int8,
                                   mode="w+", shape=(n, d))
                mirror_scales = np.memmap(args.mirror_mmap + ".scales.f32",
                                          np.float32, mode="w+", shape=(n,))

                @jax.jit
                def _quant(x):
                    amax = jnp.max(jnp.abs(x), axis=-1)
                    s = jnp.maximum(amax, 1e-12) / 127.0
                    return (jnp.clip(jnp.round(x / s[:, None]), -127, 127)
                            .astype(jnp.int8), s)

                t0 = time.perf_counter()
                for ci in range(nchunks):
                    qc, qs = _quant(gen(chunk_keys[ci]))
                    mirror[ci * CHUNK:(ci + 1) * CHUNK] = np.asarray(qc)
                    mirror_scales[ci * CHUNK:(ci + 1) * CHUNK] = np.asarray(qs)
                mirror.flush(); mirror_scales.flush()
                print(f"backfilled memmap mirror in "
                      f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)
        host_mirror = mirror is not None
        print(f"loaded codes cache {cache}", file=sys.stderr)
    else:
        # train residual PQ on chunk 0's first 262k rows
        rpq = train_residual_pq(
            jax.random.PRNGKey(7), c0[:262_144], num_subspaces=args.subspaces,
            coarse_clusters=args.coarse, num_iters=12, opq_iters=2, coarse_iters=8,
            aniso_eta=eta,
        )
        print(f"trained rpq in {time.perf_counter()-t0:.1f}s "
              f"(aniso_eta={eta})", file=sys.stderr)

        enc = jax.jit(lambda x: residual_pq_encode(rpq, x, eta))
        ext_host = np.empty((n, m + 2), np.uint8)
        if host_mirror and args.mirror_mmap:
            mirror = np.memmap(args.mirror_mmap + ".codes.i8", np.int8,
                               mode="w+", shape=(n, d))
            mirror_scales = np.memmap(args.mirror_mmap + ".scales.f32",
                                      np.float32, mode="w+", shape=(n,))
        else:
            mirror = np.empty((n, d), np.int8) if host_mirror else None
            mirror_scales = np.empty((n,), np.float32) if host_mirror else None

        @jax.jit
        def quant(x):
            amax = jnp.max(jnp.abs(x), axis=-1)
            s = jnp.maximum(amax, 1e-12) / 127.0
            return jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(jnp.int8), s

        t0 = time.perf_counter()
        for ci in range(nchunks):
            x = gen(chunk_keys[ci]) if ci else c0
            cids, codes = enc(x)
            ext_host[ci * CHUNK:(ci + 1) * CHUNK] = np.asarray(
                residual_codes_ext(cids, codes)
            )
            if host_mirror:
                qc, qs = quant(x)
                mirror[ci * CHUNK:(ci + 1) * CHUNK] = np.asarray(qc)
                mirror_scales[ci * CHUNK:(ci + 1) * CHUNK] = np.asarray(qs)
            if (ci + 1) % 10 == 0:
                print(f"encoded {ci+1}/{nchunks} chunks "
                      f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
        print(f"encode total {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        if cache:
            # a memmapped mirror is its own cache (raw files persist);
            # embedding 38 GB into the npz would defeat it
            extra = ({"mirror": mirror, "mirror_scales": mirror_scales}
                     if host_mirror and not args.mirror_mmap else {})
            # atomic: a killed run must not leave a truncated npz behind
            np.savez(cache + ".tmp.npz", rows=n, m=m, ext=ext_host,
                     aniso_eta=eta or 0.0,
                     rotation=np.asarray(rpq.rotation),
                     coarse=np.asarray(rpq.coarse),
                     centroids=np.asarray(rpq.codebook.centroids), **extra)
            os.replace(cache + ".tmp.npz", cache)
            print(f"saved codes cache {cache}", file=sys.stderr)

    # exact fp32 ground truth: regenerate chunks, device matmul, host merge
    @jax.jit
    def chunk_topk(k_i, q):
        x = _gen_chunk(k_i, centers, mix, d, args.sigma)
        s = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, args.k)

    t0 = time.perf_counter()
    best_s = np.full((args.batch, 0), -np.inf, np.float32)
    best_i = np.zeros((args.batch, 0), np.int64)
    for ci in range(nchunks):
        s_c, i_c = chunk_topk(chunk_keys[ci], queries)
        best_s = np.concatenate([best_s, np.asarray(s_c)], axis=1)
        best_i = np.concatenate([best_i, np.asarray(i_c, np.int64) + ci * CHUNK], axis=1)
        if best_s.shape[1] > 4 * args.k:  # keep the running top-k small
            sel = np.argsort(-best_s, axis=1)[:, : args.k]
            best_s = np.take_along_axis(best_s, sel, axis=1)
            best_i = np.take_along_axis(best_i, sel, axis=1)
    sel = np.argsort(-best_s, axis=1)[:, : args.k]
    truth = np.take_along_axis(best_i, sel, axis=1)
    print(f"ground truth in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # serving: fused residual-PQ ADC scan over the ext codes
    if args.sorted_coarse:
        from crs_tpu.ops.pallas_scan import (
            adc_auto_group, pallas_topk_residual_pq_adc_sorted,
            plan_sorted_coarse_windows,
        )
        from crs_tpu.ops.pq import sort_codes_by_coarse

        t0 = time.perf_counter()
        ext_host, perm, counts = sort_codes_by_coarse(ext_host, args.coarse)
        group = adc_auto_group(n, args.batch, args.block_size, m + 2)
        wbase = plan_sorted_coarse_windows(counts, n, args.block_size, group)
        assert wbase is not None, \
            "layout too fragmented for the 512-id sorted window"
        wbase_dev = jnp.asarray(wbase)
        perm_dev = jnp.asarray(perm)
        print(f"sorted layout in {time.perf_counter()-t0:.1f}s "
              f"(group={group}, tiles={wbase.shape[0]})", file=sys.stderr)
    ext_dev = jnp.asarray(ext_host)
    jax.block_until_ready(ext_dev)
    hbm_bytes = ext_dev.size  # uint8
    print(f"HBM serving footprint: {hbm_bytes/1e9:.2f} GB "
          f"({(m+2)} B/vec x {n/1e6:.0f}M rows)", file=sys.stderr)

    # NO extra jit wrapper: pallas_topk_residual_pq_adc is already jitted and
    # takes the codes as an ARGUMENT — a closure here would bake the [N, M+2]
    # codes into the HLO as a constant and blow the remote-compile request
    # past its ~100 MB limit (HTTP 413; STATUS lesson (c), hit at 40M rows)
    if args.sorted_coarse:
        def scan(q):
            s, i = pallas_topk_residual_pq_adc_sorted(
                rpq.rotation, rpq.coarse, rpq.codebook.centroids, ext_dev,
                wbase_dev, q, args.cand, n, args.block_size, group=group,
            )
            return s, jnp.where(i >= 0, perm_dev[i], -1)
    else:
        def scan(q):
            return pallas_topk_residual_pq_adc(
                rpq.rotation, rpq.coarse, rpq.codebook.centroids, ext_dev,
                q, args.cand, n, args.block_size,
            )
    adc_s, adc_i = scan(queries)
    jax.block_until_ready(adc_i)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        adc_s, adc_i = scan(queries)
    jax.block_until_ready(adc_i)
    scan_s = (time.perf_counter() - t0) / reps

    adc_i_np = np.asarray(adc_i)
    adc_s_np = np.asarray(adc_s)

    def recall(pred, width=None):
        width = width or args.k
        return float(np.mean([
            len(set(pred[b, :width]) & set(truth[b])) / args.k
            for b in range(args.batch)
        ]))

    out = {
        "rows": n, "dim": d, "bytes_per_vec_hbm": m + 2,
        "hbm_gb": round(hbm_bytes / 1e9, 2),
        "scan_ms": round(scan_s * 1e3, 2),
        "ms_per_query": round(scan_s * 1e3 / args.batch, 4),
        "recall_at_k_none": recall(adc_i_np),
        "recall_k_in_cand": recall(adc_i_np, width=args.cand),
        "cand": args.cand, "k": args.k,
        "sorted_coarse": bool(args.sorted_coarse),
    }
    if host_mirror:
        rows = np.clip(adc_i_np, 0, n - 1)
        t0 = time.perf_counter()
        vecs = mirror[rows].astype(np.float32) * mirror_scales[rows][..., None]
        exact = np.einsum("bd,bcd->bc", np.asarray(queries), vecs)
        exact = np.where(adc_s_np <= -1e29, -1e30, exact)
        sel = np.argsort(-exact, axis=1)[:, : args.k]
        host_pred = np.take_along_axis(adc_i_np, sel, axis=1)
        out["host_rescore_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
        out["recall_at_k_host"] = recall(host_pred)
        out["host_mirror_gb"] = round((mirror.nbytes + mirror_scales.nbytes) / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
