"""Fused pallas decode-attention kernel vs the XLA one-row decode path.

The kernel (ops/decode_attention.py) is an opt-in A/B baseline: on v5e it
measured SLOWER than the XLA path (per-call DMA stalls; SCALING.md), so
``backend="auto"`` resolves to xla — but its math must stay exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.fast_decode import greedy_decode_fast
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

NUM_ANSWERS = 30
BOS = 1


def _model(num_heads=2, hidden=128):
    """hd = hidden/num_heads must divide 128 for the kernel."""
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=hidden, intermediate_size=2 * hidden,
        ptr_query_size=hidden, max_obj_num=8, max_ocr_num=6,
        num_decoding_steps=4, max_seq_length=6,
        num_attention_heads=num_heads, num_spatial_relations=num_heads,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=hidden, intermediate_size=2 * hidden,
        num_attention_heads=num_heads,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 3, num_answers_vocab=NUM_ANSWERS)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return model, batch, params


@pytest.mark.parametrize("num_heads,hidden", [(2, 128), (4, 256)])
def test_fused_greedy_matches_xla(num_heads, hidden):
    model, batch, params = _model(num_heads, hidden)
    s_x, p_x = greedy_decode_fast(model, params, batch, BOS, backend="xla")
    s_f, p_f = greedy_decode_fast(model, params, batch, BOS, backend="fused")
    np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))
    np.testing.assert_allclose(
        np.asarray(s_f), np.asarray(s_x), rtol=2e-5, atol=2e-5
    )


def test_fused_raises_on_unsupported_head_layout():
    """hd that does not divide 128 (e.g. 48) must raise for explicit
    backend=\"fused\" (auto falls back silently)."""
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=96, intermediate_size=192, ptr_query_size=96,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
        num_attention_heads=2, num_spatial_relations=2,
    )  # hd = 48
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=96, intermediate_size=192,
        num_attention_heads=2,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    with pytest.raises(ValueError, match="fused decode kernel unsupported"):
        greedy_decode_fast(model, params, batch, BOS, backend="fused")
