"""Hashed n-gram featurization: native C++ fast path + exact Python fallback.

The host-side hot loop of index build. Algorithm spec (shared verbatim with
``native/text_native.cpp`` — both paths MUST produce identical features):

- lowercase ASCII; word chars = ``[a-z0-9]`` plus any byte ≥ 0x80,
- grams = unigrams + adjacent bigrams joined with ``\\x1f``,
- bucket = FNV-1a-64(gram) mod num_features,
- weight = 1 + ln(count).

The ``*_counts`` variants additionally support char 3/4-grams per word
(``^``/``$`` boundary-padded, windows only when the padded word is strictly
longer than n) and return RAW counts — the corpus-fitted lexical encoder
(``crs_tpu.rag.embedding.LexicalLSAEncoder``) applies BM25×IDF weighting on
top of them.

The C++ library is compiled on demand with g++ (no pybind11 in the image —
plain ctypes over an ``extern "C"`` API) and cached next to the source;
failures fall back to the Python implementation silently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["featurize", "featurize_batch", "featurize_batch_counts", "native_available"]

_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_MASK = (1 << 64) - 1

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "text_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libtext_native.so"))

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("CRS_TPU_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info("built native featurizer: %s", _SO)
        lib = ctypes.CDLL(_SO)
        lib.featurize.restype = ctypes.c_int
        lib.featurize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.featurize_batch.restype = ctypes.c_int
        lib.featurize_batch.argtypes = [
            ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
            ctypes.c_int, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
        ]
        if hasattr(lib, "featurize_batch_ex"):
            lib.featurize_batch_ex.restype = ctypes.c_int
            lib.featurize_batch_ex.argtypes = [
                ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
                ctypes.c_int, ctypes.c_longlong, ctypes.c_int,
                np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.float32),
                np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
            ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain dependent
        logger.warning("native featurizer unavailable (%s); using Python path", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _build_and_load() is not None


# -- pure-Python spec implementation ----------------------------------------

def _fnv1a(data: bytes, h: int = _FNV_OFFSET) -> int:
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def _tokenize_bytes(text: str) -> List[bytes]:
    raw = text.encode("utf-8")
    words: List[bytes] = []
    current = bytearray()
    for b in raw:
        if 65 <= b <= 90:  # ASCII uppercase → lowercase
            b += 32
        if (97 <= b <= 122) or (48 <= b <= 57) or b >= 0x80:
            current.append(b)
        elif current:
            words.append(bytes(current))
            current = bytearray()
    if current:
        words.append(bytes(current))
    return words


def _count_py(
    text: str, num_features: int, char_ngrams: bool = False, word_grams: bool = True
) -> Dict[int, int]:
    words = _tokenize_bytes(text)
    counts: Dict[int, int] = {}
    if word_grams:
        for w in words:
            idx = _fnv1a(w) % num_features
            counts[idx] = counts.get(idx, 0) + 1
        for a, b in zip(words, words[1:]):
            idx = _fnv1a(a + b"\x1f" + b) % num_features
            counts[idx] = counts.get(idx, 0) + 1
    if char_ngrams:
        for w in words:
            # native path caps words at 256 bytes before padding
            padded = b"^" + w[:256] + b"$"
            for n in (3, 4):
                if len(padded) > n:
                    for i in range(len(padded) - n + 1):
                        idx = _fnv1a(padded[i : i + n]) % num_features
                        counts[idx] = counts.get(idx, 0) + 1
    return counts


def _featurize_py(text: str, num_features: int) -> Dict[int, float]:
    counts = _count_py(text, num_features)
    # float32 rounding matches the native path bit-for-bit
    return {i: float(np.float32(1.0) + np.log(np.float32(c))) for i, c in counts.items()}


# -- public API ---------------------------------------------------------------

def featurize(text: str, num_features: int) -> Dict[int, float]:
    lib = _build_and_load()
    if lib is None:
        return _featurize_py(text, num_features)
    raw = text.encode("utf-8")
    cap = max(2 * len(raw) + 16, 256)
    idx = (ctypes.c_longlong * cap)()
    w = (ctypes.c_float * cap)()
    n = lib.featurize(raw, len(raw), num_features, idx, w, cap)
    if n < 0:
        return _featurize_py(text, num_features)
    return {int(idx[i]): float(w[i]) for i in range(n)}


def featurize_batch(
    texts: Sequence[str], num_features: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR-style batch featurization: (indices, weights, offsets[n+1])."""
    lib = _build_and_load()
    if lib is None:
        indices: List[int] = []
        weights: List[float] = []
        offsets = [0]
        for t in texts:
            f = _featurize_py(t, num_features)
            indices.extend(f.keys())
            weights.extend(f.values())
            offsets.append(len(indices))
        return (
            np.asarray(indices, np.int64),
            np.asarray(weights, np.float32),
            np.asarray(offsets, np.int64),
        )
    encoded = [t.encode("utf-8") for t in texts]
    blob = b"".join(encoded)
    text_offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=text_offsets[1:])
    cap = max(2 * len(blob) + 16 * len(texts) + 256, 1024)
    out_idx = np.zeros(cap, np.int64)
    out_w = np.zeros(cap, np.float32)
    out_off = np.zeros(len(texts) + 1, np.int64)
    n = lib.featurize_batch(
        blob, text_offsets, len(texts), num_features, out_idx, out_w, out_off, cap
    )
    if n < 0:  # overflow — retry text-by-text via the safe path
        return featurize_batch_fallback(texts, num_features)
    return out_idx[:n].copy(), out_w[:n].copy(), out_off


def featurize_batch_counts(
    texts: Sequence[str], num_features: int, char_ngrams: bool = True,
    parts: str = "both",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR-style batch featurization with RAW counts (+ optional char n-grams):
    (indices, counts, offsets[n+1]). Native fast path via featurize_batch_ex
    (mode bit 0 = char n-grams, bit 1 = raw counts, bit 2 = char-only).

    ``parts``: "both" (default), "word" (uni/bigrams only), or "char"
    (char 3/4-grams only) — the split the lexical encoder uses to weight
    char-gram features below word features."""
    if parts == "word":
        char_ngrams = False
    word_grams = parts != "char"
    mode = 2 | (1 if char_ngrams else 0) | (0 if word_grams else 4)
    lib = _build_and_load()
    if lib is not None and hasattr(lib, "featurize_batch_ex"):
        encoded = [t.encode("utf-8") for t in texts]
        blob = b"".join(encoded)
        text_offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum([len(e) for e in encoded], out=text_offsets[1:])
        # char n-grams multiply feature count ~6x vs word grams
        per_char = 8 if char_ngrams else 2
        cap = max(per_char * len(blob) + 16 * len(texts) + 256, 1024)
        out_idx = np.zeros(cap, np.int64)
        out_w = np.zeros(cap, np.float32)
        out_off = np.zeros(len(texts) + 1, np.int64)
        n = lib.featurize_batch_ex(
            blob, text_offsets, len(texts), num_features, mode,
            out_idx, out_w, out_off, cap,
        )
        if n >= 0:
            return out_idx[:n].copy(), out_w[:n].copy(), out_off
    indices: List[int] = []
    weights: List[float] = []
    offsets = [0]
    for t in texts:
        f = _count_py(t, num_features, char_ngrams, word_grams=word_grams)
        indices.extend(f.keys())
        weights.extend(float(c) for c in f.values())
        offsets.append(len(indices))
    return (
        np.asarray(indices, np.int64),
        np.asarray(weights, np.float32),
        np.asarray(offsets, np.int64),
    )


def featurize_batch_fallback(texts, num_features):
    indices, weights, offsets = [], [], [0]
    for t in texts:
        f = featurize(t, num_features)
        indices.extend(f.keys())
        weights.extend(f.values())
        offsets.append(len(indices))
    return (
        np.asarray(indices, np.int64),
        np.asarray(weights, np.float32),
        np.asarray(offsets, np.int64),
    )
