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


def prefetch_to_device(
    batch_iter: Iterator[Dict],
    size: int = 2,
    sharding=None,
    process_local: bool = False,
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
                if process_local and sharding is not None:
                    import numpy as _np

                    dev = {
                        k: jax.make_array_from_process_local_data(
                            sharding, _np.asarray(v)
                        )
                        for k, v in dev.items()
                    }
                elif sharding is not None:
                    dev = {
                        k: jax.device_put(v, sharding) for k, v in dev.items()
                    }
                else:
                    dev = {k: jax.device_put(v) for k, v in dev.items()}
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
