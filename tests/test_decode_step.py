"""Per-step decode megakernel (ops/decode_step.py) vs the XLA one-row path.

Like the per-layer kernel, the megakernel is an opt-in A/B baseline: on
v5e its per-program fixed costs outweigh the fusion win (SCALING.md), so
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


def _model(num_heads=2, hidden=128, layer_types=None):
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
    )
    kw = dict(
        hidden_size=hidden, intermediate_size=2 * hidden,
        ptr_query_size=hidden, max_obj_num=8, max_ocr_num=6,
        num_decoding_steps=4, max_seq_length=6,
        num_attention_heads=num_heads, num_spatial_relations=num_heads,
    )
    if layer_types:
        kw.update(layer_type_list=tuple(layer_types),
                  mix_list=tuple("share3" if t != "n" else "none"
                                 for t in layer_types))
    mmt = dataclasses.replace(cfg.mmt, **kw)
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=hidden, intermediate_size=2 * hidden,
        num_attention_heads=num_heads,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb,
                               mix_list=mmt.mix_list)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 4, num_answers_vocab=NUM_ANSWERS)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return model, batch, params


@pytest.mark.parametrize("layer_types", [None, ("n", "s", "s")])
def test_mega_greedy_matches_xla(layer_types):
    model, batch, params = _model(layer_types=layer_types)
    s_x, p_x = greedy_decode_fast(model, params, batch, BOS, backend="xla")
    s_m, p_m = greedy_decode_fast(model, params, batch, BOS, backend="mega")
    np.testing.assert_array_equal(np.asarray(p_m), np.asarray(p_x))
    np.testing.assert_allclose(
        np.asarray(s_m), np.asarray(s_x), rtol=2e-5, atol=2e-5
    )


def test_mega_raises_on_nonuniform_heads():
    """Implicit layers (16 heads, hd=48 at hidden 768) break the uniform
    hd | 128 requirement — explicit backend="mega" must raise."""
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {}})
    mmt = dataclasses.replace(
        cfg.mmt, layer_type_list=("n", "s", "i"),
        mix_list=("none", "share3", "share3"), num_implicit_relations=4,
    )
    model = SAM4C(params_cfg=SAM4CParams(mmt, cfg.text_bert, NUM_ANSWERS))
    task = dataclasses.replace(cfg, mmt=mmt, mix_list=mmt.mix_list)
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    with pytest.raises(ValueError, match="megakernel unsupported"):
        greedy_decode_fast(model, params, batch, BOS, backend="mega")
