"""Native C++ featurizer: build, exact parity with the Python spec, fallback."""

import numpy as np
import pytest

from crs_tpu.rag.hashed_features import (
    _featurize_py, featurize, featurize_batch, native_available,
)

SAMPLES = [
    "Quantization reduces the precision of LLM weights! (e.g., int8)",
    "naïve café — unicode test 数学",
    "",
    "a b a b a b repeated tokens",
    "UPPER lower MiXeD 123 456",
    "x" * 5000,
]


def test_python_spec_basics():
    f = _featurize_py("hello world hello", 1024)
    assert len(f) >= 3  # 2 unigrams + 2 bigrams, some may collide
    assert all(0 <= k < 1024 for k in f)
    # repeated unigram gets sublinear weight > 1
    assert any(w > 1.0 for w in f.values())


def test_empty_text():
    assert _featurize_py("", 1024) == {}
    assert featurize("", 1024) == {}


@pytest.mark.skipif(not native_available(), reason="g++ toolchain unavailable")
def test_native_matches_python_exactly():
    for t in SAMPLES:
        assert featurize(t, 32768) == _featurize_py(t, 32768), t


@pytest.mark.skipif(not native_available(), reason="g++ toolchain unavailable")
def test_native_batch_csr():
    idx, w, off = featurize_batch(SAMPLES, 32768)
    assert off[0] == 0 and off[-1] == len(idx) == len(w)
    # row 2 is the empty text: zero features
    assert off[3] - off[2] == 0
    # CSR rows reproduce per-text featurize
    for row, t in enumerate(SAMPLES):
        got = dict(zip(idx[off[row]:off[row+1]].tolist(), w[off[row]:off[row+1]].tolist()))
        want = {k: pytest.approx(v, abs=1e-6) for k, v in featurize(t, 32768).items()}
        assert got.keys() == want.keys()


def test_fallback_when_disabled(monkeypatch):
    import crs_tpu.rag.hashed_features as hf

    monkeypatch.setenv("CRS_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(hf, "_lib", None)
    monkeypatch.setattr(hf, "_load_attempted", False)
    f = hf.featurize("fallback path test", 4096)
    assert f == _featurize_py("fallback path test", 4096)
    idx, w, off = hf.featurize_batch(["a b", "c"], 4096)
    assert off.tolist()[0] == 0 and len(idx) == off[-1]


def test_hashed_encoder_uses_featurizer():
    from crs_tpu.rag.embedding import HashedEncoder

    enc = HashedEncoder(dim=64, seed=0)
    e = enc.encode(["quantization of weights", "quantization of weights"])
    np.testing.assert_array_equal(e[0], e[1])
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)
