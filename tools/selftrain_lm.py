#!/usr/bin/env python
"""Self-train the generator LM on the bundled corpus (VERDICT r4 next #2).

The quality columns of BASELINE.md (perplexity, RAG answer F1, faithfulness,
RAG-vs-no-RAG deltas) were structurally zero because the generator was
random-init and real checkpoints are environment-gated (REQUESTS.md #2).
This tool produces a REAL (small) language model entirely in-image: a
byte-level Mistral-family LM pretrained on the bundled survey-paper corpus
(`/root/reference/data/2308.07633v4-clean.pdf`) with mixed-in QA-instruct
samples in the EXACT prompt formats the RAG generator emits at inference
(`crs_tpu/rag/generation.py:111-138`), so `main.py --evaluate` measures a
model that actually models its evaluation distribution.

Objective mix per epoch:
- corpus next-byte LM windows (stride seq/2), loss on every real token;
- QA-instruct samples (TRAIN split only; 10 questions held out for eval,
  matching the reference's 10-question RAG eval) in three prompt variants
  (chat-fallback `[INST] .. [/INST]`, simple retry prompt, no-context),
  loss masked to the ANSWER tokens;
- contexts for QA samples come from OUR OWN retriever over the indexed
  corpus — the same distribution the evaluator will feed the model.

Run on the TPU (default); `--cpu` pins the CPU backend for smoke tests.
The checkpoint saves via JaxModel.save_pretrained and loads back through
`config.json model.model_path` (native-checkpoint branch of JaxModel.load).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CORPUS = "/root/reference/data/2308.07633v4-clean.pdf"
QA = "/root/reference/data/2308.07633v4-qa.json"


def build_text():
    from crs_tpu.rag.document_processing import DocumentProcessor

    dp = DocumentProcessor({})
    pages = dp.process_file(CORPUS)
    text = "\n\n".join(t for t, _ in pages)
    return text


def qa_split(seed: int = 0, n_eval: int = 10):
    import numpy as np

    items = json.loads(Path(QA).read_text())
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(items))
    eval_idx = sorted(int(i) for i in order[:n_eval])
    train = [items[i] for i in range(len(items)) if i not in set(eval_idx)]
    evals = [items[i] for i in eval_idx]
    return train, evals, eval_idx


def retrieve_contexts(questions, top_k=3, max_chars=1200):
    """Top-k chunk contexts from our own pipeline (lexical encoder config,
    like config.json) — the evaluator's context distribution."""
    from crs_tpu.rag.chunking import TextChunker
    from crs_tpu.rag.document_processing import DocumentProcessor
    from crs_tpu.rag.embedding import EmbeddingModel
    from crs_tpu.rag.index import VectorStore
    from crs_tpu.rag.retrieval import ContextRetriever
    from crs_tpu.utils.config import ConfigLoader

    cfg = ConfigLoader(str(REPO / "config.json"))
    dp = DocumentProcessor(cfg.get("rag.document_processing") or {})
    pages = dp.process_file(CORPUS)
    ck = TextChunker(cfg.get("rag.chunking") or {})
    chunks = [c for t, p in pages for c in ck.chunk(t, page_number=p)]
    em = EmbeddingModel(cfg.get("rag.embedding") or {})
    store = VectorStore({"format": "fp32", "block_size": 256})
    store.create_index(chunks, em.embed_chunks(chunks))
    retr = ContextRetriever(store, em, cfg.get("rag.retrieval") or {})
    out = []
    for q in questions:
        hits = retr.retrieve(q, top_k=top_k)
        ctx = "\n\n".join(h["text"] for h in hits)[:max_chars]
        out.append(ctx)
    return out


def qa_sample_texts(item, ctx):
    """(prompt, answer) pairs in the generator's inference formats."""
    q, a = item["question"], item["answer"]
    user = (
        "Use the following context to answer the question. "
        "Answer concisely based only on the context.\n\n"
        f"Context:\n{ctx}\n\nQuestion: {q}"
    )
    return [
        (f"[INST] {user} [/INST]", " " + a),
        (f"Context: {ctx}\n\nQuestion: {q}\nAnswer:", " " + a),
        (f"[INST] {q} [/INST]", " " + a),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "checkpoints" / "selftrained_small"))
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1536)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--inter", type=int, default=1536)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--qa-every", type=int, default=4,
                    help="every Nth step trains a QA-instruct batch")
    ap.add_argument("--holdout-frac", type=float, default=0.08)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--make-contexts", default=None, metavar="JSON",
                    help="internal: build QA retrieval contexts and exit")
    args = ap.parse_args()

    if args.make_contexts:
        # context building is host-logic-heavy (lexical encoder fit, per-
        # query retrieval): through the TPU tunnel every host sync costs
        # ~0.75 s, so this phase runs in a CPU-pinned subprocess
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        qa_train, _, _ = qa_split()
        ctxs = retrieve_contexts([x["question"] for x in qa_train])
        Path(args.make_contexts).write_text(json.dumps(ctxs))
        return
    if args.cpu:
        # env var alone is NOT enough: the image's sitecustomize re-pins the
        # axon platform in every interpreter (see tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from crs_tpu.models.bytes_tokenizer import ByteTokenizer
    from crs_tpu.models.transformer import TransformerConfig, forward, init_params

    tok = ByteTokenizer()
    text = build_text()
    cut = int(len(text) * (1.0 - args.holdout_frac))
    train_text, held_text = text[:cut], text[cut:]
    print(f"corpus: {len(text)} chars ({cut} train / {len(held_text)} held out)",
          flush=True)

    # -- corpus windows -------------------------------------------------------
    ids_all = np.array(tok.encode(train_text, max_length=None), np.int32)
    stride = args.seq // 2
    windows = [
        ids_all[s:s + args.seq]
        for s in range(0, max(len(ids_all) - args.seq, 1), stride)
    ]
    print(f"{len(windows)} corpus windows of {args.seq}", flush=True)

    # -- QA-instruct samples (contexts from a CPU-pinned subprocess) ----------
    qa_train, qa_eval, eval_idx = qa_split()
    ctx_json = Path(args.out) / "train_contexts.json"
    if not ctx_json.exists():
        os.makedirs(args.out, exist_ok=True)
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, __file__, "--make-contexts", str(ctx_json)],
            check=True, env=env, timeout=1800,
        )
    ctxs = json.loads(ctx_json.read_text())
    qa_texts = []
    for item, ctx in zip(qa_train, ctxs):
        qa_texts.extend(qa_sample_texts(item, ctx))
    print(f"{len(qa_texts)} QA-instruct samples (train={len(qa_train)}, "
          f"eval held out={len(qa_eval)})", flush=True)

    cfg = TransformerConfig(
        vocab_size=384, hidden_size=args.hidden, num_layers=args.layers,
        num_heads=args.heads, num_kv_heads=args.kv_heads,
        intermediate_size=args.inter, max_seq_len=2048, dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f}M params", flush=True)

    # -- batches (fixed shapes: one compile) ----------------------------------
    rng = np.random.default_rng(1)

    def corpus_batch():
        ids = np.full((args.batch, args.seq), tok.pad_id, np.int32)
        mask = np.zeros((args.batch, args.seq), np.bool_)
        for r in range(args.batch):
            w = windows[rng.integers(len(windows))]
            ids[r, :len(w)] = w
            mask[r, :len(w)] = True
        return ids, mask, mask.copy()

    qa_encoded = []
    for prompt, ans in qa_texts:
        p_ids = tok.encode(prompt, max_length=None)
        a_ids = tok.encode(ans, max_length=None, add_eos=True)[1:]  # drop BOS
        seq = (p_ids + a_ids)[:args.seq]
        loss_from = min(len(p_ids), len(seq))
        qa_encoded.append((np.array(seq, np.int32), loss_from))

    def qa_batch():
        ids = np.full((args.batch, args.seq), tok.pad_id, np.int32)
        mask = np.zeros((args.batch, args.seq), np.bool_)
        lmask = np.zeros((args.batch, args.seq), np.bool_)
        for r in range(args.batch):
            seq, loss_from = qa_encoded[rng.integers(len(qa_encoded))]
            ids[r, :len(seq)] = seq
            mask[r, :len(seq)] = True
            lmask[r, loss_from:len(seq)] = True
        return ids, mask, lmask

    # -- train step ------------------------------------------------------------
    warmup = min(max(args.steps // 50, 10), max(args.steps // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps + warmup)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(schedule, weight_decay=0.01))
    opt_state = tx.init(params)

    def loss_fn(p, ids, mask, lmask):
        logits = forward(p, cfg, ids, mask)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1, :], ids[:, 1:])
        valid = lmask[:, 1:] & mask[:, :-1]
        return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)

    @jax.jit
    def step(p, s, ids, mask, lmask):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, mask, lmask)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    t0 = time.perf_counter()
    log = []
    for i in range(args.steps):
        ids, mask, lmask = (qa_batch() if args.qa_every and i % args.qa_every == 0
                            else corpus_batch())
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(lmask))
        if i % args.log_every == 0 or i == args.steps - 1:
            lv = float(loss)
            dt = time.perf_counter() - t0
            print(f"step {i}: loss={lv:.4f} ({dt:.0f}s)", flush=True)
            log.append({"step": i, "loss": lv, "t": round(dt, 1)})

    # -- held-out byte perplexity ----------------------------------------------
    held_ids = np.array(tok.encode(held_text, max_length=None), np.int32)
    nll, count = 0.0, 0
    eval_windows = [held_ids[s:s + args.seq]
                    for s in range(0, max(len(held_ids) - 16, 1), args.seq)]
    eval_loss = jax.jit(loss_fn)
    for w in eval_windows:
        ids = np.full((1, args.seq), tok.pad_id, np.int32)
        mask = np.zeros((1, args.seq), np.bool_)
        ids[0, :len(w)] = w
        mask[0, :len(w)] = True
        lv = float(eval_loss(params, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(mask)))
        n = max(len(w) - 1, 1)
        nll += lv * n
        count += n
    ppl = float(np.exp(nll / max(count, 1)))
    print(f"held-out byte perplexity: {ppl:.3f} over {count} bytes", flush=True)

    # -- save -------------------------------------------------------------------
    from crs_tpu.models.model_interface import JaxModel

    m = JaxModel({"config": "small", "max_seq_len": 2048})
    m.cfg, m.params, m.tokenizer, m._loaded = cfg, params, tok, True
    m.config_name = "selftrained_small"
    os.makedirs(args.out, exist_ok=True)
    m.save_pretrained(args.out)
    result = {
        "params_millions": round(n_params / 1e6, 2),
        "steps": args.steps,
        "final_loss": log[-1]["loss"] if log else None,
        "heldout_byte_perplexity": round(ppl, 4),
        "heldout_bytes": count,
        "qa_eval_indices": eval_idx,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "log": log,
    }
    Path(args.out, "selftrain_result.json").write_text(json.dumps(result, indent=2))
    print(json.dumps({k: v for k, v in result.items() if k != "log"}), flush=True)


if __name__ == "__main__":
    main()
