"""Evaluator driver tests: greedy and beam split runs, external ground
truth (eval_df analogue), EvalAI dumps."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.dataset import EpochBatcher
from sam_textvqa_tpu.data.synthetic import SyntheticDataset
from sam_textvqa_tpu.data.vocab import VocabDict
from sam_textvqa_tpu.evaluation.evaluator import Evaluator
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams


@pytest.fixture(scope="module")
def setup():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    words = ["<pad>", "<s>", "</s>", "<unk>"] + [f"w{i}" for i in range(40)]
    vocab = VocabDict(words)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, len(vocab)))
    ds = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    batch = {
        k: jnp.asarray(v)
        for k, v in ds.get_batch(range(2)).items()
        if not k.startswith("_") and k != "question_id"
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, vocab, ds, params


def test_run_split_greedy(setup, tmp_path):
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab)
    result = ev.run_split(params, EpochBatcher(ds, 4, shuffle=False).epoch_batches())
    assert result["num_scored"] == 12
    assert len(result["predictions"]) == 12
    assert result["accuracy"] is not None
    out = ev.dump_evalai(result, str(tmp_path / "evalai.json"))
    payload = json.loads(open(out).read())
    assert len(payload) == 12 and {"question_id", "answer"} <= set(payload[0])


def test_run_split_greedy_xla_early_same_answers(setup):
    """decode_backend="xla_early" (all-rows-EOS while_loop exit) must
    produce the same predictions and accuracy through the full evaluator
    path — answer decoding stops at the first EOS, which the early-exit
    contract preserves exactly."""
    task, model, vocab, ds, params = setup
    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches()
    )
    got = Evaluator(model, vocab, decode_backend="xla_early").run_split(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches()
    )
    assert got["accuracy"] == want["accuracy"]
    assert [p["pred_answer"] for p in got["predictions"]] == [
        p["pred_answer"] for p in want["predictions"]
    ]


def test_run_split_external_gt(setup):
    task, model, vocab, ds, params = setup
    ds_no_ans = SyntheticDataset(task, 12, num_answers_vocab=len(vocab),
                                 with_answers=False)
    ev = Evaluator(model, vocab)
    r = ev.run_split(params, EpochBatcher(ds_no_ans, 4, shuffle=False).epoch_batches())
    assert r["num_scored"] == 0 and r["accuracy"] is None
    gt = {int(q): ["stop"] * 10 for q in ds_no_ans.pool["question_id"]}
    r2 = ev.run_split(
        params, EpochBatcher(ds_no_ans, 4, shuffle=False).epoch_batches(),
        gt_answers_by_qid=gt,
    )
    assert r2["num_scored"] == 12 and r2["accuracy"] is not None


def test_run_split_beam_reports_vqa_and_anls(setup):
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab)
    r = ev.run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), beam_size=2
    )
    assert r["num_scored"] == 12
    assert r["accuracy"] is not None and r["anls"] is not None
    assert all("topkscore" in p for p in r["predictions"])


def test_run_split_beam_per_beam_schema(setup):
    """Reference beam-evaluator schema parity: every beam decoded and
    scored (accuracies_df, reference evaluator.py:312-340) with the
    headline row equal to the argmax-topkscore beam (best_result_df,
    :344-351)."""
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab)
    r = ev.run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), beam_size=3
    )
    assert len(r["predictions"]) == 12
    for p in r["predictions"]:
        assert len(p["beams"]) == 3
        scores = [b["topkscore"] for b in p["beams"]]
        assert p["best_beam"] == int(np.argmax(scores))
        best = p["beams"][p["best_beam"]]
        assert p["pred_answer"] == best["pred_answer"]
        assert p["topkscore"] == best["topkscore"]
        # gt present in this fixture -> per-beam accuracy attached
        assert all("accuracy" in b for b in p["beams"])
        # (B, K, T): BOS + T-1 decoded tokens (see beam_search_decode)
        assert all(len(b["pred_ids"]) == task.mmt.num_decoding_steps
                   for b in p["beams"])


def test_run_split_beam_early_exit_identical(setup):
    """run_split_beam(early_exit=True) routes through the while_loop beam
    decoder, which is bit-identical to the scan — the full result schema
    (per-beam rows, best-beam headline, metrics) must match exactly."""
    task, model, vocab, ds, params = setup
    want = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), 3
    )
    got = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), 3,
        early_exit=True,
    )
    assert got["accuracy"] == want["accuracy"]
    assert got["anls"] == want["anls"]
    assert got["predictions"] == want["predictions"]


def test_run_split_ocr_bucket_identical(setup):
    """run_split(ocr_bucket=3) routes batches whose rows all carry <= 3
    real OCR tokens through a narrower compiled executable (same params)
    and must produce IDENTICAL predictions: the dropped slots' -10000 bias
    contributes exactly 0.0 to every f32 softmax. Only the MASK is
    truncated here — the dropped slots keep their random feature values,
    proving masked-slot contents are irrelevant. The split mixes eligible
    batches (rows 0-7) with an ineligible one (rows 8-11, full fallback)."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:8, 3:] = 0.0

    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches()
    )
    ev = Evaluator(model, vocab)
    got = ev.run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(),
        ocr_bucket=3,
    )
    assert got["predictions"] == want["predictions"]
    assert got["accuracy"] == want["accuracy"]
    # the bucket executable really was compiled (and the full one kept)
    assert (True, "auto", (None, 3)) in ev._greedy
    assert (True, "auto", None) in ev._greedy


def test_run_split_ocr_bucket_ladder(setup):
    """run_split(ocr_bucket=[2, 4]) — a LADDER of widths: each batch routes
    to the narrowest executable that fits its rows. The split carries one
    batch per regime (rows 0-3 fit 2 slots, 4-7 fit 4, 8-11 need full
    width) and every prediction must equal the single-executable run."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:4, 2:] = 0.0
    ds2.pool["pad_ocr_mask"][4:8, 4:] = 0.0

    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches()
    )
    ev = Evaluator(model, vocab)
    got = ev.run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(),
        ocr_bucket=[4, 2],  # unsorted on purpose — normalized ascending
    )
    assert got["predictions"] == want["predictions"]
    assert got["accuracy"] == want["accuracy"]
    # every rung (and the full-width fallback) really ran
    for tag in ((None, 2), (None, 4), None):
        assert (True, "auto", tag) in ev._greedy


def test_run_split_obj_bucket_identical(setup):
    """run_split(obj_bucket=[3, 5]) — the obj-axis analogue of the OCR
    ladder: batches whose rows all carry <= rung real obj boxes route
    through a narrower executable with IDENTICAL predictions (same -10000
    masked-softmax argument; obj tokens are never position-indexed in any
    output). Only the MASK is truncated — dropped slots keep random
    features. Rows 0-3 fit 3 boxes, 4-7 fit 5, 8-11 need full width."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_obj_mask"][:4, 3:] = 0.0
    ds2.pool["pad_obj_mask"][4:8, 5:] = 0.0
    ds2.pool["pad_obj_mask"][8:, :] = 1.0  # force full-width fallback

    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches()
    )
    ev = Evaluator(model, vocab)
    got = ev.run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(),
        obj_bucket=[5, 3],  # unsorted on purpose — normalized ascending
    )
    assert got["predictions"] == want["predictions"]
    assert got["accuracy"] == want["accuracy"]
    for tag in ((3, None), (5, None), None):
        assert (True, "auto", tag) in ev._greedy


def test_run_split_obj_and_ocr_grid_identical(setup):
    """Both ladders at once: run_split(obj_bucket=4, ocr_bucket=3) routes
    each batch to the narrowest (obj, ocr) GRID cell that fits — including
    the both-axes-shrunk cell — with identical predictions."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    # batch 0: both axes fit; batch 1: only obj fits; batch 2: neither
    ds2.pool["pad_obj_mask"][:8, 4:] = 0.0
    ds2.pool["pad_ocr_mask"][:4, 3:] = 0.0
    ds2.pool["pad_ocr_mask"][4:, :] = 1.0
    ds2.pool["pad_obj_mask"][8:, :] = 1.0

    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches()
    )
    ev = Evaluator(model, vocab)
    got = ev.run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(),
        obj_bucket=4, ocr_bucket=3,
    )
    assert got["predictions"] == want["predictions"]
    assert got["accuracy"] == want["accuracy"]
    for tag in ((4, 3), (4, None), None):
        assert (True, "auto", tag) in ev._greedy


def test_run_split_beam_obj_bucket_identical(setup):
    """Beam decode through the obj ladder: full per-beam schema must match
    the full-width run (selections identical; see the OCR-beam test for
    the one-ulp CPU score caveat)."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_obj_mask"][:8, 4:] = 0.0

    want = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(), 2
    )
    got = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(), 2,
        obj_bucket=4,
    )
    assert got["accuracy"] == want["accuracy"]
    assert [p["pred_answer"] for p in got["predictions"]] == [
        p["pred_answer"] for p in want["predictions"]
    ]
    assert [p["best_beam"] for p in got["predictions"]] == [
        p["best_beam"] for p in want["predictions"]
    ]
    for a, b in zip(got["predictions"], want["predictions"]):
        for ba, bb in zip(a["beams"], b["beams"]):
            assert ba["pred_ids"] == bb["pred_ids"]
            np.testing.assert_allclose(
                ba["topkscore"], bb["topkscore"], rtol=0, atol=1e-5
            )


def test_run_split_beam_ocr_bucket_identical(setup):
    """run_split_beam(ocr_bucket=[2, 4]): beam decode routes through the
    same narrow-executable ladder as greedy; the full per-beam schema
    (beams, topkscores, best-beam headline) must match the full-width run
    exactly."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:4, 2:] = 0.0
    ds2.pool["pad_ocr_mask"][4:8, 4:] = 0.0

    want = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(), 2
    )
    got = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(), 2,
        ocr_bucket=[2, 4],
    )

    # Every SELECTION (token ids, answers, best beam) must be identical.
    # Cumulative beam scores are compared to one f32 ulp instead of
    # bitwise: on CPU, XLA's reduction lane-grouping shifts when the
    # sequence shortens, moving low-order bits (measured bit-identical on
    # TPU; see shrink_ocr_batch).
    def strip_scores(preds):
        return [
            {
                **{k: v for k, v in p.items() if k != "topkscore"},
                "beams": [
                    {k: v for k, v in b.items() if k != "topkscore"}
                    for b in p["beams"]
                ],
            }
            for p in preds
        ]

    assert strip_scores(got["predictions"]) == strip_scores(want["predictions"])
    for gp, wp in zip(got["predictions"], want["predictions"]):
        assert abs(gp["topkscore"] - wp["topkscore"]) < 1e-5
        for gb, wb in zip(gp["beams"], wp["beams"]):
            assert abs(gb["topkscore"] - wb["topkscore"]) < 1e-5
    assert got["accuracy"] == want["accuracy"]
    assert got["anls"] == want["anls"]


def test_run_split_dataset_smaller_than_batch(setup):
    """A split smaller than one batch must still serve a full fixed-shape
    batch (np.resize tiling in EpochBatcher) and score only the real rows."""
    task, model, vocab, ds, params = setup
    tiny = SyntheticDataset(task, 3, num_answers_vocab=len(vocab))
    batches = list(EpochBatcher(tiny, 8, shuffle=True, seed=3).epoch_batches())
    assert len(batches) == 1
    assert batches[0]["question_indices"].shape[0] == 8
    assert batches[0]["_real_count"] == 3
    ev = Evaluator(model, vocab)
    result = ev.run_split(
        params, EpochBatcher(tiny, 8, shuffle=True, seed=3).epoch_batches()
    )
    assert result["num_scored"] == 3 and len(result["predictions"]) == 3


def test_evaluator_decode_cache_keyed_on_backend(setup):
    """Mutating fast_decode/decode_backend after first use must not keep
    decoding with a stale jitted fn (advisor finding, round 2)."""
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab, fast_decode=True)
    fn_fast = ev._greedy_fn()
    ev.fast_decode = False
    fn_slow = ev._greedy_fn()
    assert fn_fast is not fn_slow
    ev.fast_decode = True
    assert ev._greedy_fn() is fn_fast


def test_run_split_string_qids(setup, tmp_path):
    """ST-VQA carries string question_ids; the evaluator must keep the real
    identity through GT joins and EvalAI dumps (reference evaluator.py:304-356)
    instead of the positional int surrogates the device arrays use."""
    task, model, vocab, ds, params = setup
    ds_no_ans = SyntheticDataset(task, 8, num_answers_vocab=len(vocab),
                                 with_answers=False)

    def batches():
        for b in EpochBatcher(ds_no_ans, 4, shuffle=False).epoch_batches():
            b["_question_id_raw"] = [
                f"stvqa_{int(q)}" for q in np.asarray(b["question_id"])
            ]
            yield b

    qid_strs = [
        f"stvqa_{int(q)}" for q in np.asarray(ds_no_ans.get_batch(range(8))["question_id"])
    ]
    gt = {q: ["w0"] * 10 for q in qid_strs}
    ev = Evaluator(model, vocab)
    result = ev.run_split(params, batches(), gt_answers_by_qid=gt)
    assert result["num_scored"] == 8
    assert sorted(p["question_id"] for p in result["predictions"]) == sorted(qid_strs)
    out = ev.dump_evalai(result, str(tmp_path / "evalai_stvqa.json"))
    payload = json.loads(open(out).read())
    assert sorted(p["question_id"] for p in payload) == sorted(qid_strs)


def test_run_split_ocr_bucket_with_early_exit_backend(setup):
    """Feature interaction: OCR bucketing routes through narrow executables
    while backend="xla_early" changes the decode loop — combined they must
    still reproduce the default path's predictions."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:8, 3:] = 0.0
    want = Evaluator(model, vocab).run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches()
    )
    got = Evaluator(model, vocab, decode_backend="xla_early").run_split(
        params, EpochBatcher(ds2, 4, shuffle=False).epoch_batches(),
        ocr_bucket=3,
    )
    assert got["predictions"] == want["predictions"]


def test_run_split_beam_sharded_device_put_matches(setup):
    """run_split_beam over a DP x TP mesh via the device_put hook (the beam
    analogue of run_split's) reproduces the single-device results."""
    from sam_textvqa_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params,
    )

    task, model, vocab, ds, params = setup
    want = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), 3
    )
    mesh = make_mesh(8, model_parallel=2)
    params_m = jax.device_put(
        params, shard_params(params, mesh, tensor_parallel=True)
    )
    bs = batch_sharding(mesh)
    got = Evaluator(model, vocab).run_split_beam(
        params_m, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), 3,
        device_put=lambda b: jax.device_put(b, bs),
    )
    assert got["accuracy"] == want["accuracy"]
    assert [p["pred_answer"] for p in got["predictions"]] == [
        p["pred_answer"] for p in want["predictions"]
    ]


def test_bucket_ladder_accepts_numpy_int(setup):
    """Configs and benchmark harnesses often carry numpy integer scalars;
    ladder normalization must treat np.int64(3) as a single width, not
    iterate it."""
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab)
    assert ev._normalize_ladder(np.int64(3), 50, "ocr") == (3,)
    assert ev._normalize_ladder([np.int64(4), 2], 50, "ocr") == (2, 4)
    assert ev._normalize_ladder(None, 50, "ocr") == ()


def test_width_grid_cells(setup):
    """_width_grid enumerates every (obj, ocr) rung combo except the full
    (None, None) cell, which stays the caller's full fn."""
    task, model, vocab, ds, params = setup
    ev = Evaluator(model, vocab)
    obj_l, ocr_l, grid = ev._width_grid([6, 4], 3, lambda ow, cw: (ow, cw))
    assert obj_l == (4, 6) and ocr_l == (3,)
    assert set(grid) == {(4, 3), (6, 3), (None, 3), (4, None), (6, None)}
    # ocr-only ladder: the legacy single-axis shape
    obj_l, ocr_l, grid = ev._width_grid(None, [2, 4], lambda ow, cw: (ow, cw))
    assert obj_l == () and set(grid) == {(None, 2), (None, 4)}
