"""Utility tests: prefetch iterator semantics and the step timer."""

import numpy as np
import pytest

from sam_textvqa_tpu.data.prefetch import prefetch_to_device
from sam_textvqa_tpu.utils.profiling import StepTimer, trace


def test_prefetch_preserves_order_and_host_keys():
    batches = [
        {"x": np.full((2, 2), i, np.float32), "_names": [f"a{i}", f"b{i}"]}
        for i in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i
        assert b["_names"] == [f"a{i}", f"b{i}"]


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.ones(2)}
        raise RuntimeError("boom in worker")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in worker"):
        list(it)


def test_step_timer():
    import time

    timer = StepTimer(batch_size=4)
    for _ in range(5):
        with timer:
            time.sleep(0.01)
    s = timer.summary()
    assert s["steps"] == 4  # warmup skipped
    assert 5 < s["mean_ms"] < 100
    assert s["samples_per_sec"] > 0


def test_trace_disabled_noop(tmp_path):
    with trace(str(tmp_path), enabled=False):
        pass
