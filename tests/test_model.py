"""Model tests: shapes, decode-loop equivalence, and spatial-mask semantics
checked against an independent transcription of the reference's float-mask
construction (sam/sa_m4c.py:470-584)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import load_task_config, task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams, greedy_decode
from sam_textvqa_tpu.models.spatial import build_spatial_allowed
from sam_textvqa_tpu.models.layers import causal_mask

NUM_ANSWERS = 50


@pytest.fixture(scope="module")
def tiny():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt,
        hidden_size=48,
        intermediate_size=96,
        ptr_query_size=48,
        max_obj_num=10,
        max_ocr_num=6,
        num_decoding_steps=4,
        max_seq_length=8,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt=mmt, text_bert=tb, num_answers=NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 3, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
    )["params"]
    return task, model, batch, params


def test_forward_shapes(tiny):
    task, model, batch, params = tiny
    out = model.apply({"params": params}, batch, deterministic=True)
    b = batch["train_prev_inds"].shape[0]
    t = task.mmt.num_decoding_steps
    assert out["scores"].shape == (b, t, NUM_ANSWERS + task.mmt.max_ocr_num)
    assert out["mmt_seq_output"].shape == (b, task.mmt.joint_length, 48)
    assert out["mmt_ocr_output"].shape == (b, task.mmt.max_ocr_num, 48)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_greedy_scan_matches_python_loop(tiny):
    """The lax.scan greedy decode must equal an explicit per-step loop that
    mirrors the reference's eval loop (sa_m4c.py:285-302)."""
    task, model, batch, params = tiny
    t = task.mmt.num_decoding_steps

    scores_scan, pred_scan = greedy_decode(model, params, batch, bos_idx=1)

    encodings = model.apply(
        {"params": params}, batch, method=SAM4C.encode, deterministic=True
    )
    prev = jnp.zeros_like(batch["train_prev_inds"]).at[:, 0].set(1)
    for _ in range(t):
        out = model.apply(
            {"params": params}, encodings, batch, prev,
            method=SAM4C.decode_step, deterministic=True,
        )
        argmax = jnp.argmax(out["scores"], axis=-1).astype(jnp.int32)
        prev = prev.at[:, 1:].set(argmax[:, :-1])
    np.testing.assert_allclose(
        np.asarray(scores_scan), np.asarray(out["scores"]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(pred_scan), np.asarray(argmax))


def test_encode_hoisting_is_exact(tiny):
    """encode() + decode_step() == __call__ (bit-identical), justifying
    hoisting decode-invariant work out of the greedy loop."""
    task, model, batch, params = tiny
    full = model.apply({"params": params}, batch, deterministic=True)
    enc = model.apply({"params": params}, batch, method=SAM4C.encode, deterministic=True)
    split = model.apply(
        {"params": params}, enc, batch, batch["train_prev_inds"],
        method=SAM4C.decode_step, deterministic=True,
    )
    np.testing.assert_array_equal(np.asarray(full["scores"]), np.asarray(split["scores"]))


def test_dropout_changes_and_determinism(tiny):
    task, model, batch, params = tiny
    o1 = model.apply({"params": params}, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    o2 = model.apply({"params": params}, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    o3 = model.apply({"params": params}, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(8)})
    np.testing.assert_array_equal(np.asarray(o1["scores"]), np.asarray(o2["scores"]))
    assert not np.array_equal(np.asarray(o1["scores"]), np.asarray(o3["scores"]))


def _reference_style_spatial_mask(
    adj_onehot, base_bias, q_len, dec_len, quadrants, num_spatial
):
    """Literal transcription of the reference float-mask path
    (sa_m4c.py:475-552): ones -> insert one-hot block -> quadrant zeroing ->
    (1-m)*-10000 -> permute -> min with base mask."""
    b, n, _, h = adj_onehot.shape
    length = q_len + n + dec_len
    m = jnp.ones((b, length, length, h))
    m = m.at[:, q_len : q_len + n, q_len : q_len + n, :].set(adj_onehot)
    spans = {
        1: ((0, q_len), (0, q_len)),
        2: ((0, q_len), (q_len, q_len + n)),
        4: ((q_len, q_len + n), (0, q_len)),
        7: ((q_len + n, length), (0, q_len)),
        8: ((q_len + n, length), (q_len, q_len + n)),
        9: ((q_len + n, length), (q_len + n, length)),
    }
    for q in quadrants:
        (r0, r1), (c0, c1) = spans[q]
        m = m.at[:, r0:r1, c0:c1, :num_spatial].set(0.0)
    spatial_bias = (1.0 - m) * -10000.0
    spatial_bias = jnp.transpose(spatial_bias, (0, 3, 1, 2))
    combined = jnp.minimum(base_bias, spatial_bias)
    entity_alive = (jnp.max(combined, axis=-1, keepdims=True) + 10000.0) / 10000.0
    return combined, entity_alive


def test_spatial_mask_matches_reference_construction():
    from sam_textvqa_tpu.ops.spatial_graph import (
        build_spatial_graph,
        relation_head_lut,
        spatial_head_mask_from_classes,
    )

    rng = np.random.RandomState(0)
    b, n, q_len, dec_len, h = 2, 12, 5, 3, 12
    boxes = rng.rand(b, n, 4)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 0.05) if False else boxes[:, 2:]
    boxes[:, -2:] = 0  # padding
    classes = build_spatial_graph(boxes)
    lut = relation_head_lut("3")
    onehot = spatial_head_mask_from_classes(classes, lut.astype(np.float32))

    length = q_len + n + dec_len
    col_mask = rng.randint(0, 2, size=(b, length)).astype(np.float32)
    col_mask[:, -dec_len:] = 0
    base_ok = np.broadcast_to(
        (col_mask > 0)[:, None, None, :], (b, 1, length, length)
    ).copy()
    causal = np.asarray(causal_mask(dec_len)) > 0
    base_ok[:, :, -dec_len:, -dec_len:] = causal[None, None]
    base_bias = np.where(base_ok, 0.0, -10000.0).astype(np.float32)

    ref_combined, ref_alive = _reference_style_spatial_mask(
        jnp.asarray(onehot), jnp.asarray(base_bias), q_len, dec_len, (1, 2), h
    )

    allowed = build_spatial_allowed(
        jnp.asarray(classes), jnp.asarray(lut), q_len, dec_len, (1, 2), h
    )
    ours_ok = np.asarray(allowed) & base_ok
    ours_bias = np.where(ours_ok, 0.0, -10000.0)
    np.testing.assert_array_equal(ours_bias, np.asarray(ref_combined))
    ours_alive = ours_ok.any(-1, keepdims=True).astype(np.float32)
    np.testing.assert_array_equal(ours_alive, np.asarray(ref_alive))


def test_question_rows_zeroed_in_spatial_heads(tiny):
    """With quadrants (1,2) masked, question rows are fully masked for
    spatial heads; the entity mask must zero them rather than leak uniform
    softmax (reference :574-584)."""
    task, model, batch, params = tiny
    from sam_textvqa_tpu.ops.spatial_graph import relation_head_lut

    q_len = task.mmt.max_seq_length
    dec_len = task.mmt.num_decoding_steps
    allowed = build_spatial_allowed(
        batch["spatial_classes"],
        jnp.asarray(relation_head_lut("3")),
        q_len,
        dec_len,
        (1, 2),
        12,
    )
    b, length = allowed.shape[0], allowed.shape[-1]
    col_ok = jnp.concatenate(
        [
            batch["question_mask"],
            batch["pad_obj_mask"],
            batch["pad_ocr_mask"],
            jnp.zeros((b, dec_len)),
        ],
        axis=1,
    ) > 0
    combined = np.asarray(allowed) & np.asarray(col_ok)[:, None, None, :]
    # every question row is fully masked in every spatial head
    assert not combined[:, :, :q_len, :].any()


def test_c5_and_multi_context_model():
    """share5 mix (c5 config) and a mixed share3/share5 stack must build
    distinct combined masks and run."""
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt,
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=10, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
        mix_list=("none", "none", "share5", "share5", "share3", "share3"),
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["scores"])).all()
    # wider context strictly loosens the mask
    from sam_textvqa_tpu.ops.spatial_graph import relation_head_lut

    lut3 = relation_head_lut("3")
    lut5 = relation_head_lut("5")
    assert (lut5 & ~lut3).sum() > 0 and not (lut3 & ~lut5).sum()


def test_aux_heads_forward():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt,
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=10, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
        use_aux_heads=True, aux_spatial_fusion="mul",
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    n = mmt.obj_ocr_length
    assert out["spatial_head_out"].shape == (2, n, n, 12)


def test_dropout_mask_reuse_mechanism_and_determinism():
    """dropout_mask_reuse hands every MMT layer the same per-site-type
    dropout RNG. The mechanism: same rng + same shape -> identical mask
    (verified on the building blocks), and the deterministic forward is
    bit-identical with the flag on or off (reuse only affects training
    stochasticity)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.layers import masked_softmax_attention
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    # building block: explicit dropout_rng makes the draw a pure function
    rng = jax.random.PRNGKey(3)
    scores = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    bias = jnp.zeros((2, 4, 8, 8))
    a = masked_softmax_attention(
        scores, bias, dropout_rate=0.5, deterministic=False, dropout_rng=rng
    )
    b = masked_softmax_attention(
        scores, bias, dropout_rate=0.5, deterministic=False, dropout_rng=rng
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = masked_softmax_attention(
        scores, bias, dropout_rate=0.5, deterministic=False,
        dropout_rng=jax.random.PRNGKey(4),
    )
    assert not np.array_equal(np.asarray(a), np.asarray(c))

    # end to end: flag changes nothing deterministically, trains finite
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=32)).items()
    }
    m_off = SAM4C(params_cfg=SAM4CParams(mmt, tb, 32))
    m_on = SAM4C(
        params_cfg=SAM4CParams(
            dataclasses.replace(mmt, dropout_mask_reuse=True), tb, 32
        )
    )
    params = m_off.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    out_off = m_off.apply({"params": params}, batch, deterministic=True)
    out_on = m_on.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out_off["scores"]), np.asarray(out_on["scores"])
    )
    train_out = m_on.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(train_out["scores"])).all()


def test_no_drop_zeroes_spatial_attention_dropout_only():
    """no_drop zeroes ONLY the spatial/implicit attention-probs dropout
    (reference sa_m4c.py:434-436). With every other dropout rate set to 0
    and attention dropout at 0.5, a no_drop train-mode forward must equal
    the deterministic forward, while the same config without no_drop must
    not (its spatial attention dropout still fires)."""
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    common = dict(
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.5,
        obj_drop=0.0, ocr_drop=0.0,
        layer_type_list=("s", "s"), mix_list=("share3", "share3"),
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    task = dataclasses.replace(
        cfg, mmt=dataclasses.replace(cfg.mmt, **common), text_bert=tb
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=32)).items()
    }

    def outputs(no_drop):
        mmt = dataclasses.replace(task.mmt, no_drop=no_drop)
        model = SAM4C(params_cfg=SAM4CParams(mmt, tb, 32))
        params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
        det = model.apply({"params": params}, batch, deterministic=True)
        trn = model.apply(
            {"params": params}, batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(5)},
        )
        return np.asarray(det["scores"]), np.asarray(trn["scores"])

    det_nd, trn_nd = outputs(no_drop=True)
    np.testing.assert_array_equal(det_nd, trn_nd)
    det_d, trn_d = outputs(no_drop=False)
    assert not np.array_equal(det_d, trn_d)


def test_dropout_fused_draw_mechanism_and_determinism():
    """dropout_fused_draw (OPT-IN A/B backend, measured slower end-to-end —
    SCALING.md "fused dropout draw") pre-draws all MMT-layer keep masks as
    a few large bernoulli pages. Semantics must be unchanged: the
    keep-mask application is the same inverted-dropout math as
    ``nn.Dropout``, the deterministic forward is bit-identical with the
    flag on or off, and the train forward stays stochastic and finite
    (fwd + bwd)."""
    from sam_textvqa_tpu.models.layers import apply_keep_mask

    # building block: apply_keep_mask == where(keep, x/(1-p), 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
    keep = jax.random.bernoulli(jax.random.PRNGKey(1), 0.7, x.shape)
    got = np.asarray(apply_keep_mask(x, keep, 0.3))
    want = np.where(np.asarray(keep), np.asarray(x) / 0.7, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=32)).items()
    }
    m_off = SAM4C(params_cfg=SAM4CParams(mmt, tb, 32))
    m_on = SAM4C(
        params_cfg=SAM4CParams(
            dataclasses.replace(mmt, dropout_fused_draw=True), tb, 32
        )
    )
    params = m_off.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    # deterministic forward: flag changes nothing
    out_off = m_off.apply({"params": params}, batch, deterministic=True)
    out_on = m_on.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out_off["scores"]), np.asarray(out_on["scores"])
    )

    # train forward: stochastic across keys, finite, and bwd works
    t1 = m_on.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    t2 = m_on.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(t1["scores"])).all()
    assert not np.array_equal(np.asarray(t1["scores"]), np.asarray(t2["scores"]))

    def loss(p):
        out = m_on.apply(
            {"params": p}, batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out["scores"] ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)
