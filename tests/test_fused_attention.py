"""Pallas fused spatial attention vs the jnp reference path (interpret mode
on CPU; the same kernel compiles for TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.models.layers import MASK_BIAS, causal_mask, masked_softmax_attention
from sam_textvqa_tpu.models.spatial import build_spatial_allowed
from sam_textvqa_tpu.ops.fused_attention import spatial_attention_fwd
from sam_textvqa_tpu.ops.spatial_graph import build_spatial_graph, relation_head_lut


def _jnp_reference(q, k, v, classes, lut, col_mask, q_len, n_ctx, dec_len,
                   quadrants, spatial=True):
    b, h, length, d = q.shape
    base_ok = jnp.broadcast_to(
        (col_mask > 0)[:, None, None, :], (b, 1, length, length)
    )
    causal = causal_mask(dec_len) > 0
    base_ok = base_ok.at[:, :, -dec_len:, -dec_len:].set(causal[None, None])
    if spatial:
        allowed = build_spatial_allowed(
            jnp.asarray(classes), jnp.asarray(lut), q_len, dec_len,
            quadrants, h,
        )
        combined = allowed & base_ok
    else:
        combined = jnp.broadcast_to(base_ok, (b, h, length, length))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d)
    bias = jnp.where(combined, 0.0, MASK_BIAS).astype(jnp.float32)
    probs = masked_softmax_attention(scores, bias, zero_fully_masked=True)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("quadrants", [(1, 2), (1, 2, 4, 7)])
def test_fused_matches_reference(quadrants):
    rng = np.random.RandomState(0)
    b, h, d = 2, 12, 64
    q_len, n_ctx, dec_len = 20, 30, 12
    length = q_len + n_ctx + dec_len

    q = rng.randn(b, h, length, d).astype(np.float32)
    k = rng.randn(b, h, length, d).astype(np.float32)
    v = rng.randn(b, h, length, d).astype(np.float32)
    boxes = rng.rand(b, n_ctx, 4)
    boxes[:, -5:] = 0
    classes = build_spatial_graph(boxes)
    lut = relation_head_lut("3")
    col_mask = (rng.rand(b, length) < 0.8).astype(np.float32)
    col_mask[:, -dec_len:] = 0.0

    ref = _jnp_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), classes, lut,
        jnp.asarray(col_mask), q_len, n_ctx, dec_len, quadrants,
    )
    out = spatial_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(classes), jnp.asarray(lut), jnp.asarray(col_mask),
        q_len=q_len, n_ctx=n_ctx, dec_len=dec_len,
        mask_quadrants=quadrants, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fused_full_shapes():
    """Real SA-M4C shapes: 20+150+12 = 182, 12 heads."""
    rng = np.random.RandomState(1)
    b, h, d = 1, 12, 64
    q_len, n_ctx, dec_len = 20, 150, 12
    length = 182
    q = rng.randn(b, h, length, d).astype(np.float32)
    k = rng.randn(b, h, length, d).astype(np.float32)
    v = rng.randn(b, h, length, d).astype(np.float32)
    boxes = rng.rand(b, n_ctx, 4)
    boxes[:, 120:] = 0
    classes = build_spatial_graph(boxes)
    lut = relation_head_lut("3")
    col_mask = np.ones((b, length), np.float32)
    col_mask[:, -dec_len:] = 0

    ref = _jnp_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), classes, lut,
        jnp.asarray(col_mask), q_len, n_ctx, dec_len, (1, 2),
    )
    out = spatial_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(classes), jnp.asarray(lut), jnp.asarray(col_mask),
        q_len=q_len, n_ctx=n_ctx, dec_len=dec_len, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_model_backend_parity():
    """Full SAM4C forward: pallas backend == xla backend (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=10, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
        num_spatial_relations=12,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    pc = SAM4CParams(mmt, tb, 40)
    model_xla = SAM4C(params_cfg=pc)
    model_pl = SAM4C(params_cfg=pc, attention_backend="pallas")
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=40)).items()
    }
    params = model_xla.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    out_xla = model_xla.apply({"params": params}, batch, deterministic=True)
    with pltpu.force_tpu_interpret_mode():
        out_pl = model_pl.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_pl["scores"]), np.asarray(out_xla["scores"]),
        rtol=2e-5, atol=2e-5,
    )


def test_train_gradients_match_backends():
    """Training-mode gradients: the pallas backend silently falls back to
    the XLA path when deterministic=False (the fused train kernel was
    demoted after losing 5% to XLA on v5e), so gradients must match XLA
    exactly (dropout off for comparability; interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.loss import m4c_decoding_bce_with_mask

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=10, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        obj_drop=0.0, ocr_drop=0.0,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    pc = SAM4CParams(mmt, tb, 40)
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=40)).items()
    }
    model_xla = SAM4C(params_cfg=pc)
    model_pl = SAM4C(params_cfg=pc, attention_backend="pallas")
    params = model_xla.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    def loss_fn(model):
        def f(p):
            out = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(5)},
            )
            return m4c_decoding_bce_with_mask(
                out["scores"], batch["targets"], batch["train_loss_mask"]
            )
        return f

    g_xla = jax.grad(loss_fn(model_xla))(params)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_fn(model_pl))(params)
    flat_x = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(g_pl)[0]
    for (path, gx), (_, gp) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_with_dropout_falls_back_to_xla():
    """With deterministic=False and dropout active, the pallas backend must
    run the XLA path end-to-end (the fused train kernel was removed; the
    pallas kernel is deterministic-only, ops/fused_attention.py)."""
    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.loss import m4c_decoding_bce_with_mask

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, 40), attention_backend="pallas")
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=40)).items()
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    def loss_fn(p):
        out = model.apply(
            {"params": p}, batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return m4c_decoding_bce_with_mask(
            out["scores"], batch["targets"], batch["train_loss_mask"]
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
