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


def test_cast_features_for_transfer():
    """Feature arrays down-cast to the compute dtype; targets/masks/ints
    untouched; f32 models get the batch back unmodified."""
    import jax.numpy as jnp
    import numpy as np

    from sam_textvqa_tpu.data.prefetch import (
        FEATURE_TRANSFER_KEYS,
        cast_features_for_transfer,
    )

    batch = {
        "pad_obj_features": np.ones((2, 3, 4), np.float32),
        "ocr_phoc": np.ones((2, 3, 4), np.float32),
        "targets": np.ones((2, 3), np.float32),
        "question_mask": np.ones((2, 3), np.float32),
        "spatial_classes": np.ones((2, 3, 3), np.int8),
    }
    out = cast_features_for_transfer(batch, jnp.bfloat16)
    assert out["pad_obj_features"].dtype == jnp.bfloat16
    assert out["ocr_phoc"].dtype == jnp.bfloat16
    assert out["targets"].dtype == np.float32
    assert out["question_mask"].dtype == np.float32
    assert out["spatial_classes"].dtype == np.int8
    assert cast_features_for_transfer(batch, jnp.float32) is batch
    assert set(FEATURE_TRANSFER_KEYS) >= {"pad_obj_features", "ocr_phoc"}


def test_bf16_feature_transfer_is_bit_identical():
    """Shipping features pre-cast to bf16 gives BIT-identical bf16-model
    outputs: the device's first op on each feature is .astype(bf16), and
    host-side ml_dtypes uses the same IEEE round-to-nearest-even."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.prefetch import cast_features_for_transfer
    from sam_textvqa_tpu.data.synthetic import make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, 32), dtype=jnp.bfloat16)
    host = {k: v for k, v in make_batch(task, 2, num_answers_vocab=32).items()
            if not k.startswith("_") and k != "question_id"}
    b_f32 = {k: jnp.asarray(v) for k, v in host.items()}
    b_bf16 = {
        k: jnp.asarray(v)
        for k, v in cast_features_for_transfer(host, jnp.bfloat16).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, b_f32)["params"]
    s32 = model.apply({"params": params}, b_f32, deterministic=True)["scores"]
    s16 = model.apply({"params": params}, b_bf16, deterministic=True)["scores"]
    np.testing.assert_array_equal(np.asarray(s32), np.asarray(s16))
