"""Vectorized 12-relation spatial graph over bounding boxes.

The reference builds this graph with an O(N^2) Python double loop per sample
inside a 32-process pool (reference: sam/spatial_utils.py:92-218,
textvqa_dataset.py:268-275), emitting nine (N, N) int8 matrices per sample
(the raw classes plus +-1..+-4 "rotated" directional variants). At batch
time it one-hot expands them to five (N, N, 12) tensors and unions rotations
with ``torch.max`` (reference: textvqa_dataset.py:373-409,
spatial_utils.py:33-52).

TPU-first redesign:

1. :func:`build_spatial_graph` — a fully vectorized numpy computation over
   all (N, N) box pairs at once. Output: ONE int8 class matrix (classes
   0..12). ~100x faster than the scalar loop and the only spatial tensor the
   data pipeline ships (22.5 KB/sample at N=150 instead of five one-hot
   (150,150,12) tensors).

2. Rotated variants are pure class-id arithmetic
   (:func:`rotate_classes`; the reference's ``_build_replace_dict`` mapping is
   ``((c - 4 ± k) mod 8) + 4`` on directional classes 4..11,
   spatial_utils.py:55-89).

3. The per-head boolean attention masks for any context width are a gather
   from a tiny (13, 12) lookup table (:func:`relation_head_lut`): the union
   of one-hots of a class and its +-k rotations depends only on the class id.
   :func:`spatial_head_mask_from_classes` applies it on device — cheap enough
   to rebuild inside the attention kernel instead of materializing
   (B, 12, L, L) masks in HBM.

Relation classes (reference spatial_utils.py:131-213):
  0 none/padded | 1 covers | 2 inside | 3 overlap (IoU>=0.5) |
  4..11 directional octants (within 0.5 * image diagonal) | 12 self.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from functools import lru_cache
from typing import Dict

import numpy as np

NUM_RELATIONS = 12
_DIR_LO, _DIR_HI = 4, 11  # directional class range


def build_spatial_graph(
    bbox: np.ndarray, distance_threshold: float = 0.5, threads: int = 0
) -> np.ndarray:
    """Classify every ordered box pair into one of 13 relation classes.

    Args:
      bbox: (..., N, 4) normalized [xmin, ymin, xmax, ymax]. Rows summing to
        zero are padding (reference spatial_utils.py:133-141 skips them).
      distance_threshold: directional cutoff as a fraction of the image
        diagonal (reference default 0.5).
      threads: native-path batch fan-out over sample-level worker threads
        (samples are independent, so the split cannot change bits);
        0 = auto (hardware concurrency, capped at batch/4 so small and
        single-sample calls stay on the caller's thread).

    Returns:
      (..., N, N) int8 class matrix — the reference's "1" matrix.

    Dispatches to the C++ pass (csrc/spatialgraph.cc, bit-equal by
    contract — strict IEEE doubles, same libm asin/acos) and falls back
    to the vectorized numpy implementation when the .so is unavailable.
    The native pass short-circuits padded (all-zero) rows instead of
    computing dense (N, N) temporaries, so at serving occupancy
    (20-40 valid boxes padded to 150) it is 15-28x faster per sample;
    dense worst case (150 valid) is 1.3x.
    """
    lib = _native_lib()
    if lib is not None:
        bbox = np.ascontiguousarray(bbox, dtype=np.float64)
        n = bbox.shape[-2]
        flat = bbox.reshape(-1, n, 4)
        out = np.empty((flat.shape[0], n, n), dtype=np.int8)
        lib.sam_spatial_graph(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            flat.shape[0], n, float(distance_threshold),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            int(threads),
        )
        return out.reshape(bbox.shape[:-1] + (n,))
    return _build_spatial_graph_numpy(bbox, distance_threshold)


@lru_cache(maxsize=1)
def _native_lib():
    """ctypes handle to libsamspatial.so (auto-built like ops/batcher.py);
    None -> numpy fallback."""
    csrc = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")
    so_path = os.path.join(csrc, "libsamspatial.so")
    if not os.path.exists(so_path):
        if not os.path.exists(os.path.join(csrc, "spatialgraph.cc")):
            return None
        try:
            subprocess.run(["make", "-C", csrc], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
        if not os.path.exists(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.sam_spatial_graph.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
        ]
        return lib
    except OSError:
        return None


def native_available() -> bool:
    return _native_lib() is not None


def _build_spatial_graph_numpy(
    bbox: np.ndarray, distance_threshold: float = 0.5
) -> np.ndarray:
    """Vectorized numpy reference implementation (the oracle-tested path;
    the native pass must stay bit-equal to it)."""
    bbox = np.asarray(bbox, dtype=np.float64)
    xmin, ymin, xmax, ymax = (bbox[..., k] for k in range(4))
    valid = bbox.sum(axis=-1) != 0  # (..., N)
    pair_valid = valid[..., :, None] & valid[..., None, :]

    def a(v):  # row-wise broadcast: value of box i at [i, j]
        return v[..., :, None]

    def b(v):  # col-wise broadcast: value of box j at [i, j]
        return v[..., None, :]

    # class 1/2: strict containment (reference :143-159)
    i_covers_j = (
        (a(xmin) < b(xmin)) & (a(xmax) > b(xmax))
        & (a(ymin) < b(ymin)) & (a(ymax) > b(ymax))
    )
    j_covers_i = np.swapaxes(i_covers_j, -1, -2)

    # class 3: IoU >= 0.5 (reference :161-166, bb_intersection_over_union :7-30)
    ix = np.maximum(a(xmin), b(xmin))
    iy = np.maximum(a(ymin), b(ymin))
    ix2 = np.minimum(a(xmax), b(xmax))
    iy2 = np.minimum(a(ymax), b(ymax))
    inter = np.maximum(0.0, ix2 - ix) * np.maximum(0.0, iy2 - iy)
    area = (xmax - xmin) * (ymax - ymin)
    union = a(area) + b(area) - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union != 0, inter / union, 0.0)
    overlaps = iou >= 0.5

    # classes 4..11: directional octants (reference :168-203).
    # Ordered computation: class at [i, j] derives from the angle of the
    # vector from j's center to i's center (y_diff = cy_i - cy_j). The
    # reference computes only i<j and mirrors via label_j = label_i +- pi;
    # both give the same quadrant cases, verified in tests.
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)
    y_diff = a(cy) - b(cy)
    x_diff = a(cx) - b(cx)
    dist = np.sqrt(y_diff**2 + x_diff**2)
    image_diag = math.sqrt(2.0)  # normalized 1x1 image
    within = dist < distance_threshold * image_diag

    with np.errstate(divide="ignore", invalid="ignore"):
        sin = y_diff / dist
        cos = x_diff / dist
    # quadrant-cased angle in [0, 2*pi) (reference :174-189)
    label = np.where(
        (sin >= 0) & (cos >= 0),
        np.arcsin(np.clip(sin, -1, 1)),
        np.where(
            (sin < 0) & (cos >= 0),
            np.arcsin(np.clip(sin, -1, 1)) + 2 * math.pi,
            np.where(
                (sin >= 0) & (cos < 0),
                np.arccos(np.clip(cos, -1, 1)),
                2 * math.pi - np.arccos(np.clip(cos, -1, 1)),
            ),
        ),
    )
    # NaN angle (coincident centers) falls back to class 4 (reference :192-203)
    octant = np.ceil(label / (math.pi / 4.0))
    octant_class = np.where(np.isnan(octant), 4, octant + 3).astype(np.int64)

    n = bbox.shape[-2]
    eye = np.eye(n, dtype=bool)
    classes = np.zeros(bbox.shape[:-1] + (n,), dtype=np.int64)
    # priority: containment > overlap > directional (reference's elif chain)
    classes = np.where(within, octant_class, classes)
    classes = np.where(overlaps, 3, classes)
    classes = np.where(j_covers_i, 2, classes)
    classes = np.where(i_covers_j, 1, classes)
    classes = np.where(eye, 12, classes)  # self (reference :136)
    classes = np.where(pair_valid, classes, 0)
    return classes.astype(np.int8)


def rotate_classes(classes: np.ndarray, shift: int) -> np.ndarray:
    """Rotate directional classes by ``shift`` octants; everything else -> 0.

    Equivalent to the reference's share_replace_dict matrices "31"/"32"/...
    (spatial_utils.py:55-89, filled at :205-213 only for directional pairs).
    """
    c = np.asarray(classes).astype(np.int64)
    directional = (c >= _DIR_LO) & (c <= _DIR_HI)
    rotated = ((c - _DIR_LO + shift) % 8) + _DIR_LO
    return np.where(directional, rotated, 0).astype(np.int8)


def build_shared_graphs(
    bbox: np.ndarray, distance_threshold: float = 0.5
) -> Dict[str, np.ndarray]:
    """The reference's full 9-matrix output, for parity tests / export
    (reference spatial_utils.py returns keys "1","31","32",...,"92")."""
    base = build_spatial_graph(bbox, distance_threshold)
    out = {"1": base}
    for width, (k_plus, k_minus) in zip(
        (1, 2, 3, 4), (("31", "32"), ("51", "52"), ("71", "72"), ("91", "92"))
    ):
        out[k_plus] = rotate_classes(base, width)
        out[k_minus] = rotate_classes(base, -width)
    return out


@lru_cache(maxsize=None)
def _lut_cached(rotation_width: int) -> np.ndarray:
    lut = np.zeros((13, NUM_RELATIONS), dtype=bool)
    for c in range(1, 13):
        lut[c, c - 1] = True
        if _DIR_LO <= c <= _DIR_HI:
            for r in range(1, rotation_width + 1):
                for sgn in (1, -1):
                    rot = ((c - _DIR_LO + sgn * r) % 8) + _DIR_LO
                    lut[c, rot - 1] = True
    return lut


def relation_head_lut(context_key: str) -> np.ndarray:
    """(13, 12) boolean LUT: class id -> allowed attention heads.

    ``lut[c, h]`` is True iff head ``h`` may attend across a pair whose
    relation class is ``c`` under context width ``context_key``. Row 0
    (padding / no relation) is all False. Equivalent to the reference's
    union-of-rotated-one-hots (textvqa_dataset.py:378-409) because the union
    depends only on the class id.

    context_key: "1" (raw), "3" (+-1 rotations), "5" (+-2), "7" (+-3),
    "9" (+-4).
    """
    from ..config import CONTEXT_ROTATIONS

    if context_key not in CONTEXT_ROTATIONS:
        raise ValueError(f"unknown spatial context {context_key!r}")
    return _lut_cached(CONTEXT_ROTATIONS[context_key])


def spatial_head_mask_from_classes(classes, lut):
    """On-device expansion: int class matrix -> per-head boolean mask.

    Args:
      classes: (..., N, N) integer relation classes (0..12), any int dtype.
      lut: (13, 12) bool/float LUT from :func:`relation_head_lut`.

    Returns:
      (..., N, N, 12) array with lut's dtype — 1 where the head may attend.
    """
    import jax.numpy as jnp

    lut = jnp.asarray(lut)
    return jnp.take(lut, classes.astype(jnp.int32), axis=0)
