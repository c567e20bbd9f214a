#!/usr/bin/env python
"""Multi-host (DCN-tier) dryrun: the corpus mesh across two processes.

SURVEY.md §5's distributed-backend tier promises "multi-host later via
``jax.distributed.initialize`` over DCN"; this tool keeps that promise
honest on CPU (VERDICT r4 next #8). Two processes each expose 4 virtual
host devices; ``jax.distributed.initialize`` joins them into one 8-device
global mesh, and the SAME sharded-index code paths used on the single-host
ICI mesh (``crs_tpu.parallel.sharded_index``) run unchanged — the shard_map
all_gather merge now crosses the process boundary (Gloo collectives standing
in for DCN), plus a data-parallel psum train step for the generator tier.

Modes:
  python tools/dryrun_multihost.py              # parent: spawns 2 workers
  python tools/dryrun_multihost.py --proc N     # worker (internal)

Prints "MULTIHOST OK" from each worker on success; the parent exits 0 only
if both workers did.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def worker(proc_id: int, num_procs: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # FORCE 4 local devices, replacing any inherited count (pytest's conftest
    # exports 8, which would make the global mesh 16-wide)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=num_procs, process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    from crs_tpu.ops.quant import scalar_quantize
    from crs_tpu.parallel.sharded_index import (
        shard_corpus, sharded_topk, sharded_topk_int8,
    )

    devs = np.array(jax.devices())
    assert len(devs) == 4 * num_procs, f"global devices: {len(devs)}"
    mesh = Mesh(devs, ("corpus",))

    # identical corpus on every process (deterministic host RNG)
    rng = np.random.default_rng(0)
    n, d, b, k = 4096 + 100, 128, 8, 10  # +100: exercises shard padding
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = vecs[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)

    # fp32 exact scan: shard_map all_gather merge crosses the process boundary
    vs, valid_n = shard_corpus(vecs, mesh)
    q = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P()))
    s, i = sharded_topk(vs, q, k, valid_n, mesh, block_size=512)
    got = np.asarray(i)
    true = queries @ vecs.T
    want = np.argsort(-true, axis=1)[:, :k]
    overlap = np.mean([len(set(a) & set(bb)) / k for a, bb in zip(got, want)])
    assert overlap >= 0.99, f"fp32 sharded scan overlap {overlap}"
    assert (got[:, 0] == np.arange(b)).all(), "self-retrieval failed"

    # int8 scan with fp32 rescore across hosts
    codes, scales = scalar_quantize(jnp.asarray(vecs))
    cs, _ = shard_corpus(np.asarray(codes), mesh)
    ss, _ = shard_corpus(np.asarray(scales).reshape(-1, 1), mesh)
    s8, i8 = sharded_topk_int8(cs, ss.reshape(-1), q, k, valid_n, mesh,
                               rescore_k=32, block_size=512)
    got8 = np.asarray(i8)
    overlap8 = np.mean([len(set(a) & set(bb)) / k for a, bb in zip(got8, want)])
    assert overlap8 >= 0.9, f"int8 sharded scan overlap {overlap8}"

    # data-parallel train step for the generator tier: per-device batch
    # shards, psum'd grads — the dp axis spans both processes
    from crs_tpu.models.transformer import TransformerConfig, forward, init_params

    cfg = TransformerConfig(
        vocab_size=384, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_seq_len=64,
        dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    dp_mesh = Mesh(devs, ("dp",))
    ids = rng.integers(1, 384, (8, 32)).astype(np.int32)
    ids_sh = jax.device_put(jnp.asarray(ids), NamedSharding(dp_mesh, P("dp", None)))
    params_sh = jax.device_put(params, NamedSharding(dp_mesh, P()))

    def loss_fn(p, x):
        import optax

        logits = forward(p, cfg, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1, :], x[:, 1:]).mean()

    @jax.jit
    def train_step(p, x):
        loss, grads = jax.value_and_grad(loss_fn)(p, x)
        return jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads), loss

    params2, loss = train_step(params_sh, ids_sh)
    jax.block_until_ready(params2)
    assert np.isfinite(float(loss))

    print(f"MULTIHOST OK proc={proc_id} devices={len(devs)} "
          f"fp32_overlap={overlap:.2f} int8_overlap={overlap8:.2f} "
          f"dp_loss={float(loss):.4f}", flush=True)


def parent(port: int) -> int:
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--proc", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out = f"proc {i}: TIMEOUT"
        if "MULTIHOST OK" not in out:
            ok = False
            tail = "\n".join(out.strip().splitlines()[-12:])
            print(f"proc {i} FAILED:\n{tail}")
        else:
            print([l for l in out.splitlines() if "MULTIHOST OK" in l][0])
    print("MULTIHOST DRYRUN:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=12399)
    args = ap.parse_args()
    if args.proc is None:
        return parent(args.port)
    worker(args.proc, 2, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
