"""CLI tests: main.py flows driven through main() on the CPU platform."""

import json
import sys

import pytest

import main as cli


@pytest.fixture()
def cfg_path(tmp_path):
    cfg = {
        "model": {"type": "jax", "config": "tiny"},
        "rag": {
            "chunking": {"strategy": "fixed", "chunk_size": 40, "chunk_overlap": 5, "min_chunk_size": 1},
            "embedding": {"backend": "hashed", "embedding_dim": 128},
            "vector_store": {"format": "fp32", "block_size": 128, "persist_directory": str(tmp_path / "vdb")},
            "retrieval": {"top_k": 2, "similarity_threshold": 0.02},
            "generation": {"max_new_tokens": 4, "temperature": 0.0},
        },
        "evaluation": {
            "efficiency": {"num_warmup": 1, "num_runs": 1, "max_new_tokens": 4, "batch_sizes": [1]},
            "performance": {"perplexity": {"texts": ["the quick brown fox jumps over the lazy dog today again"], "max_samples": 1}, "task_limit": 2},
            "retrieval": {"max_questions": 2},
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


@pytest.fixture()
def doc_path(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text(
        "Quantization reduces precision of weights. " * 5
        + "Pruning removes connections from networks. " * 5
    )
    return str(p)


def test_should_retrieve_heuristic():
    assert cli.should_retrieve("what is quantization?")
    assert cli.should_retrieve("Explain pruning")
    assert not cli.should_retrieve("2+2")


def test_index_then_query(cfg_path, doc_path, capsys):
    assert cli.main(["--config", cfg_path, "--index", doc_path, "--no-model"]) == 0
    out = capsys.readouterr().out
    assert "indexed" in out
    # fresh invocation loads the persisted index
    assert cli.main(["--config", cfg_path, "--query", "what is quantization?", "--no-model"]) == 0
    out = capsys.readouterr().out
    assert "uantization" in out


def test_missing_config(capsys):
    assert cli.main(["--config", "/nope.json", "--query", "x"]) == 2


def test_no_args_shows_help(capsys):
    assert cli.main([]) == 1
    assert "usage" in capsys.readouterr().out


def test_evaluate_flow(cfg_path, doc_path, tmp_path, capsys):
    cli.main(["--config", cfg_path, "--index", doc_path, "--no-model"])
    capsys.readouterr()
    rc = cli.main([
        "--config", cfg_path, "--eval-retrieval", "--no-model",
        "--output-dir", str(tmp_path / "res"),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert "errors" in summary


def test_task_utils_cli(capsys):
    from crs_tpu.evaluation.performance.tasks import main as tmain

    assert tmain(["--list"]) == 0
    assert "hellaswag" in capsys.readouterr().out
    assert tmain(["--template", "baseline"]) == 0
    tpl = json.loads(capsys.readouterr().out)
    assert tpl["hellaswag"]["enabled"]


def test_store_add_and_where_document():
    import numpy as np

    from crs_tpu.rag.chunking import Chunk
    from crs_tpu.rag.index import VectorStore

    rng = np.random.default_rng(0)
    v = rng.standard_normal((6, 32)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    chunks = [Chunk(text=f"alpha doc {i}", chunk_id=f"chunk_{i}", tokens=3) for i in range(4)]
    store = VectorStore({"format": "fp32", "block_size": 32})
    store.create_index(chunks, v[:4])
    store.add([Chunk(text="beta special doc", chunk_id="chunk_4", tokens=3),
               Chunk(text="gamma doc", chunk_id="chunk_5", tokens=2)], v[4:])
    assert store.n == 6
    res = store.search(v[4], top_k=3, where_document="beta")
    assert res["documents"][0] == ["beta special doc"]
