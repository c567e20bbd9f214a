#!/usr/bin/env python
"""PQ-only serving recall CURVE (VERDICT r3 #2): recall@10 vs bytes/vec vs
ms/query across (M subspaces, coarse clusters, cand_k) on the anisotropic
clustered corpus of tools/bench_pq_serving.py.

Round 3 published a single point (M=12, coarse=2048, cand=100 → recall@10
0.80 at 4M rows, candidate-bound); this sweeps the candidate-generation
levers to find a ≥0.9-recall config at ≤16 B/vec, or establish the
information-theoretic ceiling for this corpus family.

The corpus is generated on device in 1M-row chunks (never dense on host);
ground truth is computed ONCE per corpus and shared across the grid. `cand`
variations reuse the same encoded codes (re-scan only).

Usage:
  # chip (timing + recall), 4M rows:
  python tools/pq_recall_curve.py --rows 4000000
  # CPU (recall shape only; XLA ADC path, no pallas interpret overhead):
  python tools/pq_recall_curve.py --rows 1000000 --cpu --engine xla
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sigma", type=float, default=0.35)
    ap.add_argument("--ms", default="12,16,24", help="subspace counts")
    ap.add_argument("--coarses", default="2048,4096")
    ap.add_argument("--cands", default="100,200,400")
    ap.add_argument("--etas", default="0",
                    help="aniso η values (comma list); 0=isotropic, "
                         "'auto'=ScaNN η(T=0.2, dim) — see ops/pq.py")
    ap.add_argument("--engine", default="pallas",
                    choices=("pallas", "xla", "pallas_sorted"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--block-size", type=int, default=2048)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cache-dir", default="/tmp/pq_curve",
                    help="per-(M,coarse) codes caches for resume")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from crs_tpu.ops.pallas_scan import pallas_topk_residual_pq_adc
    from crs_tpu.ops.pq import (
        PQCodebook, ResidualPQ, aniso_eta_from_threshold, residual_codes_ext,
        residual_pq_adc_topk, residual_pq_encode, train_residual_pq,
    )
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_pq_serving import CHUNK, _gen_chunk

    def load_npz(path):
        """np.load that treats a truncated file (killed run) as a miss."""
        if not Path(path).exists():
            return None
        try:
            z = np.load(path)
            z.files  # force the zip directory read
            return z
        except Exception as e:
            print(f"cache {path} unreadable ({e}); rebuilding", file=sys.stderr)
            Path(path).unlink()
            return None

    def savez_atomic(path, **kw):
        np.savez(str(path) + ".tmp.npz", **kw)
        os.replace(str(path) + ".tmp.npz", path)

    n, d = args.rows, args.dim
    assert n % CHUNK == 0 or n < CHUNK
    chunk = min(CHUNK, n)
    nchunks = max(n // chunk, 1)
    os.makedirs(args.cache_dir, exist_ok=True)

    key = jax.random.PRNGKey(0)
    ck, qk, tk, mk = jax.random.split(key, 4)
    spec = jnp.exp(-jnp.arange(d, dtype=jnp.float32) / 20.0)
    mix = jax.random.normal(mk, (d, d), jnp.float32) * spec[None, :] / d ** 0.5
    centers = jax.random.normal(ck, (args.centers, d), jnp.float32) @ mix * 3.0
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    chunk_keys = jax.random.split(tk, nchunks)

    def gen_raw(k_i):
        x = _gen_chunk(k_i, centers, mix, d, args.sigma)
        return x[:chunk]

    gen = jax.jit(gen_raw)
    c0 = gen(chunk_keys[0])
    qn = jax.random.normal(qk, (args.batch, d), jnp.float32)
    queries = c0[: args.batch] + 0.05 * qn
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    # ---- ground truth, once per corpus ------------------------------------
    @jax.jit
    def chunk_topk(k_i, q):
        x = gen_raw(k_i)
        s = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, args.k)

    gt_cache = Path(args.cache_dir) / f"truth_{n}_{args.batch}_{args.k}.npz"
    gt_z = load_npz(gt_cache)
    if gt_z is not None:
        truth = gt_z["truth"]
    else:
        t0 = time.perf_counter()
        best_s = np.full((args.batch, 0), -np.inf, np.float32)
        best_i = np.zeros((args.batch, 0), np.int64)
        for ci in range(nchunks):
            s_c, i_c = chunk_topk(chunk_keys[ci], queries)
            best_s = np.concatenate([best_s, np.asarray(s_c)], axis=1)
            best_i = np.concatenate(
                [best_i, np.asarray(i_c, np.int64) + ci * chunk], axis=1)
            sel = np.argsort(-best_s, axis=1)[:, : args.k]
            best_s = np.take_along_axis(best_s, sel, axis=1)
            best_i = np.take_along_axis(best_i, sel, axis=1)
        truth = best_i
        savez_atomic(gt_cache, truth=truth)
        print(f"ground truth in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def recall(pred, width):
        return float(np.mean([
            len(set(pred[b, :width]) & set(truth[b])) / args.k
            for b in range(args.batch)
        ]))

    # host int8 mirror for the rescore recall (regenerate per corpus, once)
    mir_cache = Path(args.cache_dir) / f"mirror_{n}.npz"
    mdat = load_npz(mir_cache)
    if mdat is not None:
        mirror, mirror_scales = mdat["mirror"], mdat["scales"]
    else:
        mirror = np.empty((n, d), np.int8)
        mirror_scales = np.empty((n,), np.float32)

        @jax.jit
        def quant(x):
            amax = jnp.max(jnp.abs(x), axis=-1)
            s = jnp.maximum(amax, 1e-12) / 127.0
            return (jnp.clip(jnp.round(x / s[:, None]), -127, 127)
                    .astype(jnp.int8), s)

        for ci in range(nchunks):
            qc, qs = quant(gen(chunk_keys[ci]))
            mirror[ci * chunk:(ci + 1) * chunk] = np.asarray(qc)
            mirror_scales[ci * chunk:(ci + 1) * chunk] = np.asarray(qs)
        savez_atomic(mir_cache, mirror=mirror, scales=mirror_scales)

    def parse_eta(s):
        s = s.strip()
        if s == "auto":
            return aniso_eta_from_threshold(0.2, d)
        v = float(s)
        return v if v > 1.0 else None

    rows_out = []
    # Resume: a crashed sweep re-runs with the same --out; skip every
    # (m, coarse, eta, cand) combo already measured so re-runs neither
    # duplicate rows nor repeat finished scans.
    done_keys = set()
    if args.out and os.path.exists(args.out):
        for r in json.load(open(args.out)):
            done_keys.add((r["rows"], r["m"], r["coarse"],
                           r["aniso_eta"], r["cand"]))
        if done_keys:
            print(f"resume: {len(done_keys)} combos already in {args.out}",
                  file=sys.stderr)
    q_np = np.asarray(queries)
    for m, coarse, eta_s in itertools.product(
        [int(x) for x in args.ms.split(",")],
        [int(x) for x in args.coarses.split(",")],
        args.etas.split(","),
    ):
        eta = parse_eta(eta_s)
        eta_key = 0.0 if eta is None else round(float(eta), 3)
        cands = [int(x) for x in args.cands.split(",")]
        if all((n, m, coarse, eta_key, c) in done_keys for c in cands):
            print(f"resume: m={m} coarse={coarse} eta={eta_key} fully done, "
                  "skipping", file=sys.stderr)
            continue
        etag = "" if eta is None else f"_a{eta:.3g}"
        cpath = Path(args.cache_dir) / f"codes_{n}_m{m}_c{coarse}{etag}.npz"
        data = load_npz(cpath)
        if data is not None:
            rpq = ResidualPQ(rotation=jnp.asarray(data["rotation"]),
                             coarse=jnp.asarray(data["coarse"]),
                             codebook=PQCodebook(jnp.asarray(data["centroids"])))
            ext_host = data["ext"]
        else:
            t0 = time.perf_counter()
            rpq = train_residual_pq(
                jax.random.PRNGKey(7), c0[: min(262_144, chunk)],
                num_subspaces=m, coarse_clusters=coarse,
                num_iters=12, opq_iters=2, coarse_iters=8,
                aniso_eta=eta,
            )
            enc = jax.jit(lambda x: residual_pq_encode(rpq, x, eta))
            ext_host = np.empty((n, m + 2), np.uint8)
            for ci in range(nchunks):
                cids, codes = enc(gen(chunk_keys[ci]))
                ext_host[ci * chunk:(ci + 1) * chunk] = np.asarray(
                    residual_codes_ext(cids, codes))
            savez_atomic(cpath, ext=ext_host, rotation=np.asarray(rpq.rotation),
                         coarse=np.asarray(rpq.coarse),
                         centroids=np.asarray(rpq.codebook.centroids))
            print(f"m={m} coarse={coarse}: trained+encoded in "
                  f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

        ext_dev = jnp.asarray(ext_host)
        if args.engine == "xla":  # split ext back into ids + codes
            cids_dev = (ext_dev[:, 0].astype(jnp.int32) * 256
                        + ext_dev[:, 1].astype(jnp.int32))
            codes_dev = ext_dev[:, 2:].astype(jnp.int32)
        elif args.engine == "pallas_sorted":
            from crs_tpu.ops.pallas_scan import (
                adc_auto_group, pallas_topk_residual_pq_adc_sorted,
                plan_sorted_coarse_windows,
            )
            from crs_tpu.ops.pq import sort_codes_by_coarse

            t0 = time.perf_counter()
            sorted_ext, perm, counts = sort_codes_by_coarse(ext_host, coarse)
            group = adc_auto_group(n, args.batch, args.block_size, m + 2)
            wbase = plan_sorted_coarse_windows(
                counts, n, args.block_size, group)
            assert wbase is not None, \
                "layout too fragmented for the 512-id sorted window"
            ext_dev = jnp.asarray(sorted_ext)  # replaces the unsorted copy
            wbase_dev = jnp.asarray(wbase)
            perm_dev = jnp.asarray(perm)
            print(f"sorted layout in {time.perf_counter()-t0:.1f}s "
                  f"(group={group}, tiles={wbase.shape[0]})", file=sys.stderr)

        for cand in cands:
            if (n, m, coarse, eta_key, cand) in done_keys:
                print(f"resume: m={m} coarse={coarse} eta={eta_key} "
                      f"cand={cand} done, skipping", file=sys.stderr)
                continue
            if args.engine == "pallas":
                def scan(q):
                    return pallas_topk_residual_pq_adc(
                        rpq.rotation, rpq.coarse, rpq.codebook.centroids,
                        ext_dev, q, cand, n, args.block_size)
            elif args.engine == "pallas_sorted":
                def scan(q):
                    s, i = pallas_topk_residual_pq_adc_sorted(
                        rpq.rotation, rpq.coarse, rpq.codebook.centroids,
                        ext_dev, wbase_dev, q, cand, n, args.block_size,
                        group=group)
                    # map sorted-row ids back to original corpus ids ON
                    # DEVICE (one [B, cand] gather)
                    return s, jnp.where(i >= 0, perm_dev[i], -1)
            else:
                def scan(q):
                    return residual_pq_adc_topk(
                        rpq, cids_dev, codes_dev, q, cand, n)
            adc_s, adc_i = scan(queries)
            jax.block_until_ready(adc_i)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                adc_s, adc_i = scan(queries)
            jax.block_until_ready(adc_i)
            scan_ms = (time.perf_counter() - t0) * 1e3 / reps
            adc_i_np = np.asarray(adc_i)
            adc_s_np = np.asarray(adc_s)

            # host int8 rescore of the cand set (the pq_rescore="host" path)
            rsel = np.clip(adc_i_np, 0, n - 1)
            vecs = mirror[rsel].astype(np.float32) * \
                mirror_scales[rsel][..., None]
            exact = np.einsum("bd,bcd->bc", q_np, vecs)
            exact = np.where(adc_s_np <= -1e29, -1e30, exact)
            sel = np.argsort(-exact, axis=1)[:, : args.k]
            host_pred = np.take_along_axis(adc_i_np, sel, axis=1)

            row = {
                "rows": n, "m": m, "coarse": coarse, "cand": cand,
                "aniso_eta": 0.0 if eta is None else round(float(eta), 3),
                "bytes_per_vec": m + 2,
                "recall_none": round(recall(adc_i_np, args.k), 4),
                "recall_in_cand": round(recall(adc_i_np, cand), 4),
                "recall_host": round(recall(host_pred, args.k), 4),
                "scan_ms": round(scan_ms, 2),
                "ms_per_query": round(scan_ms / args.batch, 4),
                "engine": args.engine,
                "device": str(jax.devices()[0].device_kind),
            }
            rows_out.append(row)
            print(json.dumps(row), flush=True)
            if args.out:  # write incrementally — a mid-run crash or tunnel
                # drop must not lose hours of completed measurements
                os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
                existing = (json.load(open(args.out))
                            if os.path.exists(args.out) else [])
                json.dump(existing + [row], open(args.out, "w"), indent=1)

    if args.out:
        print(f"wrote {len(rows_out)} rows -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
