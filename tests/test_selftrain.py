"""Smoke test for the self-train → checkpoint → load → generate ladder.

The real run (tools/selftrain_lm.py, 3000 steps on chip) produced
checkpoints/selftrained_small/; this test re-runs the tool at toy dims for a
few steps on CPU to guard the full ladder: corpus windowing, QA-instruct
batches, the jitted train step, held-out perplexity, save_pretrained, and the
factory's native-checkpoint load branch (the path tools/eval_selftrained.py
uses per quant variant).

Reference analog: the finetune→eval loop of
/root/reference/finetuning/trainer.py:26-190.
"""

import json
import math
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CTX_JSON = REPO / "checkpoints" / "selftrained_small" / "train_contexts.json"


def test_selftrain_smoke_and_checkpoint_load(tmp_path):
    out = tmp_path / "ckpt"
    out.mkdir()
    # reuse the committed retrieval contexts: building them fits the lexical
    # encoder over the whole corpus, which is the slow part and already
    # covered by the retrieval tests
    shutil.copy(CTX_JSON, out / "train_contexts.json")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "selftrain_lm.py"),
            "--cpu", "--steps", "6", "--batch", "2", "--seq", "128",
            "--hidden", "32", "--layers", "1", "--heads", "2",
            "--kv-heads", "1", "--inter", "64", "--log-every", "2",
            "--out", str(out),
        ],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    result = json.loads((out / "selftrain_result.json").read_text())
    assert result["steps"] == 6
    assert math.isfinite(result["final_loss"])
    # 6 steps of a 0.06M model won't learn much; just require sane numerics
    # (vocab 384 → random-init ppl ~ a few hundred, not inf/nan)
    assert 1.0 < result["heldout_byte_perplexity"] < 2000.0
    assert result["heldout_bytes"] > 100
    assert len(result["qa_eval_indices"]) == 10

    # the checkpoint loads through the factory's native branch (quantizing
    # at load, as eval_selftrained does per variant) and generates
    from crs_tpu.models.model_interface import create_model_interface

    m = create_model_interface("int8", {"model_path": str(out), "max_seq_len": 256})
    m.load()
    info = m.get_model_info()
    assert info["num_parameters"] > 0
    txt = m.generate("What is quantization?", max_new_tokens=4)
    assert isinstance(txt, str)
