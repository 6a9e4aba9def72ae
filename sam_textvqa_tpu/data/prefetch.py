"""Host->device input pipeline with background prefetch.

The reference overlaps host work with compute via 16 DataLoader workers
(reference task_utils.py:156-164). Here a thread assembles the next
batches while the TPU runs the current step, and arrays are `device_put`
ahead of time (optionally with a sharding), so the device never idles on
input.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax


def prefetch_to_device(
    batch_iter: Iterator[Dict],
    size: int = 2,
    sharding=None,
) -> Iterator[Dict]:
    """Wrap a host batch iterator; device arrays arrive ``size`` batches
    ahead. Host-only keys (prefixed ``_``) pass through untouched."""

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in batch_iter:
                host = {k: v for k, v in batch.items() if k.startswith("_")}
                dev = {
                    k: v for k, v in batch.items() if not k.startswith("_")
                }
                if sharding is not None:
                    dev = {
                        k: jax.device_put(v, sharding) for k, v in dev.items()
                    }
                else:
                    dev = {k: jax.device_put(v) for k, v in dev.items()}
                q.put({**dev, **host})
            q.put(_END)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
