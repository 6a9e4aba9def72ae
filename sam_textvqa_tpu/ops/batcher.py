"""Native batch assembly: fused row gather + f32->bf16 cast (csrc/batcher.cc).

Host-side analogue of the reference's DataLoader collate (reference
task_utils.py:70-88 gathers worker outputs into batch tensors): the two
memory-bound passes of our input path — copying each sample's padded
feature rows into batch-major arrays (data/dataset.py:get_batch) and
down-casting features to the compute dtype for transfer
(data/prefetch.py:cast_features_for_transfer) — run as one GIL-free C++
pass, threaded across cores.

Backends with identical outputs (bit-equal, incl. the bf16
round-to-nearest-even cast vs ml_dtypes — tests/test_native_batcher.py):
  * native: ``csrc/batcher.cc`` -> ``libsambatch.so`` via ctypes;
  * numpy fallback when the .so is missing or unbuildable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Sequence

import numpy as np

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")

#: worker threads for the native pass; 0/unset -> all cores (capped at 8 —
#: assembly saturates memory bandwidth well before that on most hosts)
_THREADS_ENV = "SAM_BATCHER_THREADS"


#: below this many bytes a pass runs single-threaded: csrc's parallel()
#: spawns fresh std::threads per call (no pool), and create/join costs
#: ~tens of us each — more than the memcpy of a small mask/bbox array
#: (6 gather calls per batch, 4 of them tiny; see data/dataset.py)
_SMALL_PASS_BYTES = 1 << 22  # 4 MiB


def _num_threads() -> int:
    env = os.environ.get(_THREADS_ENV, "")
    if env.strip():
        return max(1, int(env))
    return max(1, min(os.cpu_count() or 1, 8))


def _threads_for(total_bytes: int) -> int:
    # an explicit SAM_BATCHER_THREADS always wins — the small-pass
    # shortcut only applies to the auto-sized default
    if os.environ.get(_THREADS_ENV, "").strip():
        return _num_threads()
    return 1 if total_bytes < _SMALL_PASS_BYTES else _num_threads()


def _try_build_native() -> Optional[str]:
    so_path = os.path.join(_CSRC_DIR, "libsambatch.so")
    src = os.path.join(_CSRC_DIR, "batcher.cc")
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
def _native_lib():
    so_path = _try_build_native()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        pp = ctypes.POINTER(ctypes.c_float)
        lib.sam_gather_f32.argtypes = [
            ctypes.POINTER(pp), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.sam_gather_cast_bf16.argtypes = [
            ctypes.POINTER(pp), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.sam_cast_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        return lib
    except OSError:
        return None


def native_available() -> bool:
    return _native_lib() is not None


def parallel_cast_enabled() -> bool:
    """True when the native cast beats numpy's: ml_dtypes' SIMD loop wins
    single-threaded, the threaded native pass wins on multi-core hosts."""
    return _native_lib() is not None and _num_threads() > 1


def bf16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _row_ptrs(rows: Sequence[np.ndarray]):
    pp = ctypes.POINTER(ctypes.c_float)
    arr = (pp * len(rows))()
    for i, r in enumerate(rows):
        arr[i] = r.ctypes.data_as(pp)
    return arr


def gather_rows(
    rows: Sequence[np.ndarray], out: Optional[np.ndarray] = None,
    cast_bf16: bool = False,
) -> np.ndarray:
    """Stack per-sample f32 arrays into one (n, *row_shape) batch array,
    optionally fused with the bf16 round-to-nearest-even down-cast.

    Every row must be a C-contiguous float32 array of one common shape.
    ``out``, if given, must be C-contiguous with the matching dtype
    (float32, or bf16 when ``cast_bf16``).
    """
    n = len(rows)
    assert n > 0, "gather_rows needs at least one row"
    shape = rows[0].shape
    elems = int(np.prod(shape, dtype=np.int64))
    dtype = bf16_dtype() if cast_bf16 else np.float32
    if out is None:
        out = np.empty((n,) + tuple(shape), dtype)
    assert out.shape == (n,) + tuple(shape) and out.dtype == dtype, (
        out.shape, out.dtype)
    assert out.flags.c_contiguous
    lib = _native_lib()
    native_ok = lib is not None and all(
        r.dtype == np.float32 and r.flags.c_contiguous and r.shape == shape
        for r in rows
    )
    if not native_ok:
        for i, r in enumerate(rows):
            out[i] = r.astype(dtype) if cast_bf16 else r
        return out
    fn = lib.sam_gather_cast_bf16 if cast_bf16 else lib.sam_gather_f32
    fn(_row_ptrs(rows), n, elems, out.ctypes.data,
       _threads_for(n * elems * 4))
    return out


def cast_bf16(src: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    """f32 -> bf16 RNE cast, parallel native when available; bit-equal to
    ``src.astype(ml_dtypes.bfloat16)``."""
    dtype = bf16_dtype()
    lib = _native_lib()
    if lib is None or not src.flags.c_contiguous or src.dtype != np.float32:
        res = src.astype(dtype)
        if out is not None:
            out[...] = res
            return out
        return res
    if out is None:
        out = np.empty(src.shape, dtype)
    assert out.shape == src.shape and out.dtype == dtype
    assert out.flags.c_contiguous
    lib.sam_cast_bf16(src.ctypes.data, src.size, out.ctypes.data,
                      _threads_for(src.size * 4))
    return out
