"""Host->device input pipeline with background prefetch.

The reference overlaps host work with compute via 16 DataLoader workers
(reference task_utils.py:156-164). Here a thread assembles the next
batches while the TPU runs the current step, and arrays are `device_put`
ahead of time (optionally with a sharding), so the device never idles on
input.

The iterator shuts the producer down cleanly when the consumer stops early
(e.g. a ``--max_steps`` break): closing/abandoning the generator sets a stop
event the producer checks on every bounded put, so no thread or device
buffer is leaked.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np

#: float32 arrays whose FIRST device-side use is ``.astype(model_dtype)``
#: (models/sa_m4c.py encode/decode_step): casting them on HOST before the
#: transfer is bit-identical (same IEEE round-to-nearest-even either side
#: of the link, via ml_dtypes) and halves the dominant host->device bytes
#: (~120 MB of features per batch-96).
FEATURE_TRANSFER_KEYS = (
    "pad_obj_features",
    "pad_ocr_features",
    "ocr_fasttext",
    "ocr_phoc",
    "pad_obj_bboxes",
    "pad_ocr_bboxes",
)


def cast_features_for_transfer(batch: Dict, dtype) -> Dict:
    """Down-cast the big float32 feature arrays to the model compute dtype
    on the host. No-op unless ``dtype`` is a sub-f32 float (bf16/f16);
    targets, masks, and int arrays are never touched. bf16 casts use the
    threaded native pass on multi-core hosts (ops/batcher.py, bit-equal to
    ml_dtypes' astype)."""
    np_dtype = np.dtype(dtype)
    if np_dtype.itemsize >= 4:  # f32/f64 model: ship f32 untouched
        return batch
    from ..ops import batcher

    native_bf16 = (
        np_dtype == batcher.bf16_dtype() and batcher.parallel_cast_enabled()
    )
    out = dict(batch)
    for k in FEATURE_TRANSFER_KEYS:
        v = out.get(k)
        if v is not None and getattr(v, "dtype", None) == np.float32:
            v = np.asarray(v)
            out[k] = batcher.cast_bf16(v) if native_bf16 else v.astype(np_dtype)
    return out


def prefetch_to_device(
    batch_iter: Iterator[Dict],
    size: int = 2,
    sharding=None,
    process_local: bool = False,
    feature_dtype=None,
) -> Iterator[Dict]:
    """Wrap a host batch iterator; device arrays arrive ``size`` batches
    ahead. Host-only keys (prefixed ``_``) pass through untouched.

    ``process_local`` (multi-host): each host's iterator yields only its
    own row slice, assembled into globally-sharded arrays via
    ``jax.make_array_from_process_local_data`` instead of ``device_put``.
    """

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batch_iter:
                host = {k: v for k, v in batch.items() if k.startswith("_")}
                dev = {
                    k: v for k, v in batch.items() if not k.startswith("_")
                }
                if feature_dtype is not None:
                    dev = cast_features_for_transfer(dev, feature_dtype)
                if process_local and sharding is not None:
                    from ..parallel.mesh import stitch_process_local

                    dev = stitch_process_local(dev, sharding)
                else:
                    # ONE device_put of the whole dict: per-leaf puts pay a
                    # full transfer round trip EACH on remote-attached TPUs
                    # (~40 ms/leaf over a tunnel — the serving engine's
                    # stage probe found this; SCALING.md "Online serving")
                    dev = (
                        jax.device_put(dev, sharding)
                        if sharding is not None
                        else jax.device_put(dev)
                    )
                if not _put({**dev, **host}):
                    return
            _put(_END)
        except BaseException as e:  # surface worker errors to the consumer
            _put(e)
        finally:
            # release the source iterator (stops nested worker pools)
            close = getattr(batch_iter, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer stopped (break / close / exception): unblock the producer
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=5.0)
