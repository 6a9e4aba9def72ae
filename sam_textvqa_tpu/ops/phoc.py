"""PHOC string featurizer (604-dim Pyramidal Histogram of Characters).

Host-side preprocessing op; its output feeds the OCR feature concat in HBM
(reference: sam/phoc/cphoc.c:10-112 via sam/datasets/processors.py:407-441).

Two backends with identical outputs:
  * native: ``csrc/phoc.cc`` compiled to ``libsamphoc.so``, bound via ctypes
    (the reference ships a prebuilt CPython extension; we keep the native op
    but with a plain-C ABI so no pybind11 is needed);
  * pure Python fallback (used automatically if the .so is missing).

The Python wrapper lowercases and filters to [a-z0-9] exactly like the
reference wrapper (reference: sam/phoc/build_phoc.py:45-50).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np

PHOC_DIM = 604
_ALPHABET = set("abcdefghijklmnopqrstuvwxyz0123456789")
_UNIGRAMS = "abcdefghijklmnopqrstuvwxyz0123456789"
_BIGRAMS = [
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el",
]
_BIGRAM_INDEX = {b: i for i, b in enumerate(_BIGRAMS)}
_BIGRAM_OFFSET = 36 * 14

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")


def _try_build_native() -> Optional[str]:
    so_path = os.path.join(_CSRC_DIR, "libsamphoc.so")
    src = os.path.join(_CSRC_DIR, "phoc.cc")
    if os.path.exists(so_path):
        return so_path
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["make", "-C", _CSRC_DIR], check=True,
            capture_output=True, timeout=120,
        )
    except Exception:
        return None
    return so_path if os.path.exists(so_path) else None


@lru_cache(maxsize=1)
def _native_lib() -> Optional[ctypes.CDLL]:
    so_path = _try_build_native()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.sam_build_phoc.restype = ctypes.c_int
    lib.sam_build_phoc.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sam_build_phoc_batch.restype = ctypes.c_int
    lib.sam_build_phoc_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def _clean(token: str) -> str:
    token = token.lower().strip()
    return "".join(c for c in token if c in _ALPHABET)


def _occupies(occ0: float, occ1: float, region: int, level: int) -> bool:
    # float32 arithmetic to match the native op bit-for-bit (cphoc.c:55-60)
    occ0 = np.float32(occ0)
    occ1 = np.float32(occ1)
    region0 = np.float32(region) / np.float32(level)
    region1 = np.float32(region + 1) / np.float32(level)
    lo = max(occ0, region0)
    hi = min(occ1, region1)
    return (hi - lo) / (occ1 - occ0) >= np.float32(0.5)


def _build_phoc_python(word: str) -> np.ndarray:
    out = np.zeros(PHOC_DIM, dtype=np.float32)
    n = len(word)
    if n == 0:
        return out
    for index, ch in enumerate(word):
        char_index = _UNIGRAMS.index(ch)
        occ0 = np.float32(index) / np.float32(n)
        occ1 = np.float32(index + 1) / np.float32(n)
        level_base = 0
        for level in range(2, 6):
            for region in range(level):
                if _occupies(occ0, occ1, region, level):
                    out[(level_base + region) * 36 + char_index] = 1.0
            level_base += level
    for i in range(n - 1):
        k = _BIGRAM_INDEX.get(word[i : i + 2])
        if k is None:
            continue
        occ0 = np.float32(i) / np.float32(n)
        occ1 = np.float32(i + 2) / np.float32(n)
        for region in range(2):
            if _occupies(occ0, occ1, region, 2):
                out[_BIGRAM_OFFSET + region * 50 + k] = 1.0
    return out


def build_phoc(token: str, backend: str = "auto") -> np.ndarray:
    """PHOC descriptor of a token. Shape (604,), float32, values in {0, 1}."""
    word = _clean(token)
    lib = _native_lib() if backend in ("auto", "native") else None
    if backend == "native" and lib is None:
        raise RuntimeError("native PHOC library unavailable")
    if lib is not None:
        out = np.zeros(PHOC_DIM, dtype=np.float32)
        rc = lib.sam_build_phoc(
            word.encode("ascii"),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return out
        # unreachable after _clean, but fall through defensively
    return _build_phoc_python(word)


def build_phoc_batch(tokens: Sequence[str], backend: str = "auto") -> np.ndarray:
    """PHOC descriptors for a token list in one native call. (N, 604)."""
    words = [_clean(t) for t in tokens]
    lib = _native_lib() if backend in ("auto", "native") else None
    if lib is not None and words:
        buf = b"\0".join(w.encode("ascii") for w in words) + b"\0"
        out = np.zeros((len(words), PHOC_DIM), dtype=np.float32)
        rc = lib.sam_build_phoc_batch(
            buf, len(words), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc == 0:
            return out
    return np.stack([_build_phoc_python(w) for w in words]) if words else (
        np.zeros((0, PHOC_DIM), dtype=np.float32)
    )
