"""Fast (encoder-cached) decode vs the reference-semantics scan decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.beam_search import beam_search_decode
from sam_textvqa_tpu.models.fast_decode import (
    beam_search_decode_fast,
    greedy_decode_fast,
)
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams, greedy_decode

NUM_ANSWERS = 30
BOS, EOS = 1, 2


@pytest.fixture(scope="module")
def tiny():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 3, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, batch, params


def test_fast_greedy_matches_scan(tiny):
    task, model, batch, params = tiny
    s_ref, p_ref = greedy_decode(model, params, batch, bos_idx=BOS)
    s_fast, p_fast = greedy_decode_fast(model, params, batch, bos_idx=BOS)
    np.testing.assert_array_equal(np.asarray(p_fast), np.asarray(p_ref))
    np.testing.assert_allclose(
        np.asarray(s_fast), np.asarray(s_ref), rtol=2e-5, atol=2e-5
    )


def test_fast_teacher_forced_scores_match_model(tiny):
    """decode_rows on a fixed prev_inds must equal the module forward."""
    from sam_textvqa_tpu.models.fast_decode import build_mmt_cache, decode_rows

    task, model, batch, params = tiny
    cfg = task.mmt
    out = model.apply({"params": params}, batch, deterministic=True)
    enc = model.apply({"params": params}, batch, method=SAM4C.encode,
                      deterministic=True)
    cache = build_mmt_cache(
        params, cfg,
        enc["text_bert_emb"].astype(jnp.float32),
        enc["obj_mmt_in"].astype(jnp.float32),
        enc["ocr_mmt_in"].astype(jnp.float32),
        batch["question_mask"].astype(jnp.float32),
        batch["pad_obj_mask"].astype(jnp.float32),
        batch["pad_ocr_mask"].astype(jnp.float32),
        batch["spatial_classes"],
    )
    scores = decode_rows(
        params, cfg, cache, params["classifier_weight"],
        batch["train_prev_inds"],
        batch["pad_ocr_mask"].astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(out["scores"]), rtol=2e-5, atol=2e-5
    )


def test_fast_beam_matches_slow_beam(tiny):
    task, model, batch, params = tiny
    k = 3
    seqs_ref, scores_ref = beam_search_decode(model, params, batch, k, BOS, EOS)
    seqs_fast, scores_fast = beam_search_decode_fast(
        model, params, batch, k, BOS, EOS
    )
    np.testing.assert_array_equal(np.asarray(seqs_fast), np.asarray(seqs_ref))
    np.testing.assert_allclose(
        np.asarray(scores_fast), np.asarray(scores_ref), rtol=2e-5, atol=2e-5
    )


def test_fast_greedy_bf16_agreement(tiny):
    """bf16 fast decode vs bf16 scan decode: same predictions (small score
    drift allowed)."""
    task, model, batch, params = tiny
    model16 = SAM4C(
        params_cfg=model.params_cfg, dtype=jnp.bfloat16
    )
    s_ref, p_ref = greedy_decode(model16, params, batch, bos_idx=BOS)
    s_fast, p_fast = greedy_decode_fast(model16, params, batch, bos_idx=BOS)
    agree = float(np.mean(np.asarray(p_fast) == np.asarray(p_ref)))
    assert agree >= 0.9, agree


@pytest.fixture(scope="module")
def tiny_implicit():
    """Config with an implicit ('i') layer: extra always-on heads, per-layer
    head counts (n: 4 heads, s: 12, i: 12 + 4 = 16) — reference
    sa_m4c.py:487-495."""
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
        layer_type_list=("n", "s", "i"),
        mix_list=("none", "share3", "share3"),
        num_attention_heads=4, num_spatial_relations=12,
        num_implicit_relations=4,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(
        cfg, mmt=mmt, text_bert=tb, mix_list=mmt.mix_list
    )
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 3, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, batch, params


def test_fast_greedy_matches_scan_implicit(tiny_implicit):
    task, model, batch, params = tiny_implicit
    s_ref, p_ref = greedy_decode(model, params, batch, bos_idx=BOS)
    s_fast, p_fast = greedy_decode_fast(model, params, batch, bos_idx=BOS)
    np.testing.assert_array_equal(np.asarray(p_fast), np.asarray(p_ref))
    np.testing.assert_allclose(
        np.asarray(s_fast), np.asarray(s_ref), rtol=2e-5, atol=2e-5
    )


def test_fast_beam_matches_slow_beam_implicit(tiny_implicit):
    task, model, batch, params = tiny_implicit
    seqs_s, scores_s = beam_search_decode(model, params, batch, 2, BOS, EOS)
    seqs_f, scores_f = beam_search_decode_fast(model, params, batch, 2, BOS, EOS)
    np.testing.assert_array_equal(np.asarray(seqs_f), np.asarray(seqs_s))
    np.testing.assert_allclose(
        np.asarray(scores_f), np.asarray(scores_s), rtol=2e-5, atol=2e-5
    )


def test_evaluator_uses_fast_path_for_implicit():
    """Implicit layers no longer force the slow scan decoder."""
    from sam_textvqa_tpu.data.vocab import VocabDict
    from sam_textvqa_tpu.evaluation.evaluator import Evaluator

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {}})
    mmt = dataclasses.replace(
        cfg.mmt, layer_type_list=("n", "s", "i"),
        mix_list=("none", "share3", "share3"), num_implicit_relations=4,
    )
    model = SAM4C(params_cfg=SAM4CParams(mmt, cfg.text_bert, NUM_ANSWERS))
    vocab = VocabDict(["<pad>", "<s>", "</s>", "<unk>"] + [f"w{i}" for i in range(26)])
    assert Evaluator(model, vocab).fast_decode
    # decoder-row quadrant masking (7/8/9) is handled too — no fallback left
    mmt_q = dataclasses.replace(mmt, attention_mask_quadrants=(1, 2, 7))
    model_q = SAM4C(params_cfg=SAM4CParams(mmt_q, cfg.text_bert, NUM_ANSWERS))
    assert Evaluator(model_q, vocab).fast_decode


def _build_quadrant_model(quadrants, implicit=False):
    """Tiny model with decoder-row quadrant masking (and optionally an
    implicit layer, whose extra heads must stay UNmasked)."""
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    kw = dict(
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
        attention_mask_quadrants=tuple(quadrants),
    )
    if implicit:
        kw.update(
            layer_type_list=("n", "s", "i"),
            mix_list=("none", "share3", "share3"),
            num_attention_heads=4, num_spatial_relations=12,
            num_implicit_relations=4,
        )
    mmt = dataclasses.replace(cfg.mmt, **kw)
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb, mix_list=mmt.mix_list)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 3, num_answers_vocab=NUM_ANSWERS)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, batch, params


@pytest.mark.parametrize(
    "quadrants,implicit",
    [
        ((1, 2, 7), False),          # dec rows x question cols cut
        ((1, 2, 9), False),          # dec rows x dec cols cut
        ((1, 2, 7, 8, 9), False),    # spatial-head dec rows fully masked
        ((1, 2, 8, 9), True),        # implicit heads must stay unmasked
    ],
)
def test_fast_greedy_matches_scan_dec_quadrants(quadrants, implicit):
    """Quadrants 7/8/9 cut decoder rows for spatial heads (reference
    sa_m4c.py:504-549); the incremental decoder must match the
    full-recompute scan exactly, including the fully-masked-row zeroing
    when all three decoder quadrants are cut."""
    task, model, batch, params = _build_quadrant_model(quadrants, implicit)
    s_ref, p_ref = greedy_decode(model, params, batch, bos_idx=BOS)
    s_fast, p_fast = greedy_decode_fast(model, params, batch, bos_idx=BOS)
    np.testing.assert_array_equal(np.asarray(p_fast), np.asarray(p_ref))
    np.testing.assert_allclose(
        np.asarray(s_fast), np.asarray(s_ref), rtol=2e-5, atol=2e-5
    )


def test_fast_beam_matches_slow_beam_dec_quadrants():
    task, model, batch, params = _build_quadrant_model((1, 2, 7, 9), implicit=True)
    seqs_s, scores_s = beam_search_decode(model, params, batch, 2, BOS, EOS)
    seqs_f, scores_f = beam_search_decode_fast(model, params, batch, 2, BOS, EOS)
    np.testing.assert_array_equal(np.asarray(seqs_f), np.asarray(seqs_s))
    np.testing.assert_allclose(
        np.asarray(scores_f), np.asarray(scores_s), rtol=2e-5, atol=2e-5
    )


def test_decode_rows_matches_model_dec_quadrants():
    """Teacher-forced multi-row decode under decoder-row quadrant cuts."""
    from sam_textvqa_tpu.models.fast_decode import build_mmt_cache, decode_rows

    task, model, batch, params = _build_quadrant_model((1, 2, 7, 8, 9), False)
    cfg = task.mmt
    out = model.apply({"params": params}, batch, deterministic=True)
    enc = model.apply({"params": params}, batch, method=SAM4C.encode,
                      deterministic=True)
    cache = build_mmt_cache(
        params, cfg,
        enc["text_bert_emb"].astype(jnp.float32),
        enc["obj_mmt_in"].astype(jnp.float32),
        enc["ocr_mmt_in"].astype(jnp.float32),
        batch["question_mask"].astype(jnp.float32),
        batch["pad_obj_mask"].astype(jnp.float32),
        batch["pad_ocr_mask"].astype(jnp.float32),
        batch["spatial_classes"],
    )
    assert any(cache.spatial_dec_masked)
    scores = decode_rows(
        params, cfg, cache, params["classifier_weight"],
        batch["train_prev_inds"],
        batch["pad_ocr_mask"].astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(out["scores"]), rtol=2e-5, atol=2e-5
    )


def test_unknown_decode_backend_raises(tiny):
    task, model, batch, params = tiny
    with pytest.raises(ValueError, match="unknown decode backend"):
        greedy_decode_fast(model, params, batch, BOS, backend="pallas")


def test_seg_lens_validate_rejects_non_contiguous_masks():
    """The fused/mega backends assume prefix-contiguous masks (advisor
    finding, round 2); _seg_lens(validate=True) must catch violations."""
    import numpy as np
    import pytest as _pytest

    from sam_textvqa_tpu.models.fast_decode import _seg_lens

    ok = {
        "question_mask": np.array([[1, 1, 0, 0]], np.float32),
        "pad_obj_mask": np.array([[1, 0, 0]], np.float32),
        "pad_ocr_mask": np.array([[1, 1, 1]], np.float32),
    }
    out = np.asarray(_seg_lens(ok, validate=True))
    assert out[0, :3].tolist() == [2.0, 1.0, 3.0]

    bad = dict(ok)
    bad["pad_obj_mask"] = np.array([[1, 0, 1]], np.float32)
    with _pytest.raises(AssertionError, match="prefix-contiguous"):
        _seg_lens(bad, validate=True)


def test_greedy_xla_flat_backend_matches_xla():
    """backend="xla_flat" (head-flat K/V, multiply-reduce attention) must
    bit-match the einsum path in f32, incl. decoder-row quadrant masking."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.fast_decode import greedy_decode_fast
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    for quads in ([2, 4], [2, 4, 7, 8, 9]):
        cfg = task_config_from_dict(
            {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
        )
        mmt = dataclasses.replace(
            cfg.mmt, hidden_size=96, intermediate_size=192, ptr_query_size=96,
            max_obj_num=10, max_ocr_num=8, num_decoding_steps=5,
            max_seq_length=8, attention_mask_quadrants=tuple(quads),
        )
        tb = dataclasses.replace(
            cfg.text_bert, hidden_size=96, intermediate_size=192
        )
        task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
        model = SAM4C(params_cfg=SAM4CParams(mmt, tb, 40), dtype=jnp.float32)
        batch = {
            k: jnp.asarray(v)
            for k, v in device_batch(
                make_batch(task, 3, num_answers_vocab=40)
            ).items()
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
        )["params"]
        s_x, p_x = greedy_decode_fast(model, params, batch, 1, backend="xla")
        s_f, p_f = greedy_decode_fast(
            model, params, batch, 1, backend="xla_flat"
        )
        np.testing.assert_array_equal(np.asarray(p_x), np.asarray(p_f))
        np.testing.assert_allclose(
            np.asarray(s_x), np.asarray(s_f), rtol=2e-5, atol=2e-5
        )


def _first_eos_exit_step(pred_ids: np.ndarray, t_max: int) -> int:
    """Step after which the early-exit loop stops: one past the LAST row's
    first EOS (the loop is batch-global), or t_max if any row never emits."""
    exit_step = 0
    for row in pred_ids:
        hits = np.flatnonzero(row == EOS)
        if hits.size == 0:
            return t_max
        exit_step = max(exit_step, int(hits[0]) + 1)
    return exit_step


def test_greedy_xla_early_matches_xla_up_to_eos(tiny):
    """backend="xla_early" must match the fixed-step path exactly for every
    step the loop actually runs (everything up to the batch's last first-EOS);
    positions past the exit step are EOS-filled by contract."""
    task, model, batch, params = tiny
    t_max = task.mmt.num_decoding_steps
    s_ref, p_ref = greedy_decode_fast(model, params, batch, BOS, backend="xla")
    s_e, p_e = greedy_decode_fast(
        model, params, batch, BOS, backend="xla_early", eos_idx=EOS
    )
    p_ref, p_e = np.asarray(p_ref), np.asarray(p_e)
    exit_step = _first_eos_exit_step(p_ref, t_max)
    np.testing.assert_array_equal(p_e[:, :exit_step], p_ref[:, :exit_step])
    np.testing.assert_allclose(
        np.asarray(s_e)[:, :exit_step], np.asarray(s_ref)[:, :exit_step],
        rtol=2e-5, atol=2e-5,
    )
    assert (p_e[:, exit_step:] == EOS).all()


def test_greedy_xla_early_skips_steps_after_all_eos(tiny):
    """With params biased so step 0 already argmaxes to EOS for every row,
    the while_loop must run exactly ONE step: scores at t>=1 are the
    untouched one-hot EOS filler (proving those steps never executed),
    unlike the fixed-step path whose later rows hold real logits."""
    task, model, batch, params = tiny
    biased = dict(params)
    biased["classifier_bias"] = params["classifier_bias"].at[EOS].add(1e4)
    s_e, p_e = greedy_decode_fast(
        model, biased, batch, BOS, backend="xla_early", eos_idx=EOS
    )
    s_e, p_e = np.asarray(s_e), np.asarray(p_e)
    assert (p_e == EOS).all()
    # t>=1 rows are bit-exactly the filler: zero everywhere, 1 at EOS
    filler = np.zeros_like(s_e[:, 1:])
    filler[:, :, EOS] = 1.0
    np.testing.assert_array_equal(s_e[:, 1:], filler)
    # step 0 rows are REAL logits (the biased EOS column dominates)
    assert (s_e[:, 0, EOS] > 100.0).all()
    # the fixed-step path, by contrast, fills every step with real logits
    s_x, _ = greedy_decode_fast(model, biased, batch, BOS, backend="xla")
    assert not np.array_equal(np.asarray(s_x)[:, 1:], filler)


def test_greedy_xla_early_requires_eos(tiny):
    task, model, batch, params = tiny
    with pytest.raises(ValueError, match="requires eos_idx"):
        greedy_decode_fast(model, params, batch, BOS, backend="xla_early")


def test_greedy_xla_early_under_jit_and_quadrants():
    """xla_early inside jax.jit (the evaluator/serving usage) across decoder
    -row quadrant configs; answers must match the fixed-step backend."""
    import dataclasses

    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch

    for quads in ([2, 4], [2, 4, 7, 8, 9]):
        cfg = task_config_from_dict(
            {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
        )
        mmt = dataclasses.replace(
            cfg.mmt, hidden_size=96, intermediate_size=192, ptr_query_size=96,
            max_obj_num=10, max_ocr_num=8, num_decoding_steps=5,
            max_seq_length=8, attention_mask_quadrants=tuple(quads),
        )
        tb = dataclasses.replace(
            cfg.text_bert, hidden_size=96, intermediate_size=192
        )
        task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
        model = SAM4C(params_cfg=SAM4CParams(mmt, tb, 40), dtype=jnp.float32)
        batch = {
            k: jnp.asarray(v)
            for k, v in device_batch(
                make_batch(task, 3, num_answers_vocab=40)
            ).items()
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
        )["params"]

        @jax.jit
        def early(p, b):
            return greedy_decode_fast(
                model, p, b, 1, backend="xla_early", eos_idx=EOS
            )

        s_x, p_x = greedy_decode_fast(model, params, batch, 1, backend="xla")
        s_e, p_e = early(params, batch)
        p_x, p_e = np.asarray(p_x), np.asarray(p_e)
        exit_step = _first_eos_exit_step(p_x, mmt.num_decoding_steps)
        np.testing.assert_array_equal(p_e[:, :exit_step], p_x[:, :exit_step])
        assert (p_e[:, exit_step:] == EOS).all()


def test_beam_early_exit_bit_identical(tiny):
    """beam_search_decode_fast(early_exit=True) must be BIT-identical to the
    fixed-step scan: once a beam is done its step scores collapse to {0 at
    EOS, -inf elsewhere}, so skipped steps would only append EOS at
    unchanged totals with an identity top_k reorder. Checked both where the
    loop runs to completion (random params) and where it exits after ~2 of
    4 steps (EOS-biased params)."""
    task, model, batch, params = tiny
    biased = dict(params)
    biased["classifier_bias"] = params["classifier_bias"].at[EOS].add(1e4)
    for p in (params, biased):
        seqs_ref, scores_ref = beam_search_decode_fast(
            model, p, batch, 3, BOS, EOS
        )
        seqs_e, scores_e = beam_search_decode_fast(
            model, p, batch, 3, BOS, EOS, early_exit=True
        )
        np.testing.assert_array_equal(np.asarray(seqs_e), np.asarray(seqs_ref))
        np.testing.assert_array_equal(
            np.asarray(scores_e), np.asarray(scores_ref)
        )
    # the biased case really does finish early: every beam's tail is EOS
    assert (np.asarray(seqs_e)[:, :, 2:] == EOS).all()
