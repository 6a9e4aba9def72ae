"""Metric tests: EvalAI normalization, VQA soft score, ANLS, STVQA exact
match, and prediction decoding — checked against the reference implementations
when mounted."""

import sys

import numpy as np
import pytest

from sam_textvqa_tpu.evaluation.metrics import (
    EvalAIAnswerProcessor,
    STVQAAccuracyEvaluator,
    STVQAANLSEvaluator,
    TextVQAAccuracyEvaluator,
    decode_predictions,
    levenshtein,
)

from conftest import (
    REFERENCE_ROOT,
    load_reference_module,
    reference_available,
)


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_evalai_processor_basics():
    p = EvalAIAnswerProcessor()
    assert p("The Cat") == "cat"
    assert p("two") == "2"
    assert p("dont") == "don't"
    # ";" has no adjacent space and no digit-comma context -> replaced by " "
    assert p("stop;sign") == "stop sign"


def test_anls():
    ev = STVQAANLSEvaluator()
    assert ev.get_anls("hello", "hello") == 1.0
    assert ev.get_anls("hello", "xxxxx") == 0.0
    acc, _ = ev.eval_pred_list(
        [{"pred_answer": "coca cola", "gt_answers": ["coca-cola", "pepsi"]}]
    )
    assert 0.5 < acc <= 1.0


def test_vqa_soft_score():
    ev = TextVQAAccuracyEvaluator()
    preds = [
        {"pred_answer": "cat", "gt_answers": ["cat"] * 3 + ["dog"] * 7},
    ]
    acc, scores = ev.eval_pred_list(preds)
    # leave-one-out: (7*min(3/3,1) + 3*min(2/3,1)) / 10 = 0.9
    assert acc == pytest.approx(0.9)
    preds = [{"pred_answer": "cat", "gt_answers": ["cat"] * 1 + ["dog"] * 9}]
    acc, _ = ev.eval_pred_list(preds)
    # (1*0 + 9*min(1/3,1)) / 10 = 0.3
    assert acc == pytest.approx(0.3)


def test_stvqa_exact_match():
    ev = STVQAAccuracyEvaluator()
    acc, _ = ev.eval_pred_list(
        [
            {"pred_answer": "STOP", "gt_answers": ["stop", "go"]},
            {"pred_answer": "left", "gt_answers": ["right"]},
        ]
    )
    assert acc == pytest.approx(0.5)


def test_decode_predictions_ocr_copy_and_eos():
    vocab = ["<pad>", "<s>", "</s>", "<unk>", "red", "stop"]
    eos = 2
    ids = np.array(
        [
            [4, 5, eos, 4],            # "red stop" then EOS stops
            [6, 7, eos, 0],            # two OCR copies (offsets 0, 1)
        ]
    )
    ocr = [["aaa", "bbb"], ["sign", "here"]]
    out = decode_predictions(ids, ocr, vocab, eos)
    assert out[0]["pred_answer"] == "red stop"
    assert out[0]["belongs_to"] == ["vocab", "vocab", "vocab+eos"]
    assert out[1]["pred_answer"] == "sign here"
    assert out[1]["belongs_to"][:2] == ["ocr", "ocr"]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_matches_reference_evalai_processor():
    ref_metrics = load_reference_module(
        "sam/datasets/metrics.py", "ref_metrics"
    )
    ref, ours = ref_metrics.EvalAIAnswerProcessor(), EvalAIAnswerProcessor()
    cases = [
        "The Cat", "two", "dont", "stop;sign", "3,000", "a.m.", "hello-world",
        "it's 5 o'clock", "none", "forty two", "Mc Donald's", "1.5", "(yes)",
        "y'allll", "somebody'd", "", "  spaces  ", "don't stop",
    ]
    for c in cases:
        assert ours(c) == ref(c), c


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_matches_reference_vqa_evaluator():
    RefEval = load_reference_module(
        "sam/datasets/metrics.py", "ref_metrics"
    ).TextVQAAccuracyEvaluator

    rng = np.random.RandomState(0)
    words = ["cat", "dog", "stop sign", "two", "coca cola", "unanswerable"]
    preds = []
    for _ in range(25):
        gt = [words[rng.randint(len(words))] for _ in range(10)]
        preds.append(
            {"pred_answer": words[rng.randint(len(words))], "gt_answers": gt}
        )
    ref_acc, ref_scores = RefEval().eval_pred_list(preds)
    our_acc, our_scores = TextVQAAccuracyEvaluator().eval_pred_list(preds)
    assert our_acc == pytest.approx(ref_acc)
    assert our_scores == pytest.approx(ref_scores)


def test_native_editdistance_matches_python():
    from sam_textvqa_tpu.evaluation.metrics import (
        _levenshtein_python,
        _native_edit_lib,
        levenshtein,
    )

    if _native_edit_lib() is None:
        pytest.skip("native edit-distance lib unavailable")
    import random

    rng = random.Random(0)
    alphabet = "abcdefg 0123ü"
    for _ in range(200):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 15)))
        assert levenshtein(a, b) == _levenshtein_python(a, b), (a, b)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ocrvqa_matches_reference():
    """OCRVQAAccuracy (reference metrics.py:84-89) is STVQAAccuracy under a
    distinct metric name — dead code in the reference (task_utils.py:60-67
    never dispatches it), mirrored here for inventory completeness. Oracle:
    same scores as the reference wrapper's evaluator, same name."""
    from sam_textvqa_tpu.evaluation.metrics import OCRVQAAccuracyEvaluator

    ref_metrics = load_reference_module("sam/datasets/metrics.py", "ref_metrics")
    ref_wrap = ref_metrics.OCRVQAAccuracy()
    assert ref_wrap.name == OCRVQAAccuracyEvaluator.name == "ocrvqa_accuracy"

    rng = np.random.RandomState(7)
    words = ["cat", "dog", "stop sign", "two", "coca cola", "unanswerable"]
    preds = [
        {
            "pred_answer": words[rng.randint(len(words))],
            "gt_answers": [words[rng.randint(len(words))] for _ in range(10)],
        }
        for _ in range(25)
    ]
    ref_acc, ref_scores = ref_wrap.evaluator.eval_pred_list(preds)
    our_acc, our_scores = OCRVQAAccuracyEvaluator().eval_pred_list(preds)
    assert our_acc == pytest.approx(ref_acc)
    assert our_scores == pytest.approx(ref_scores)

    from sam_textvqa_tpu.evaluation.evaluator import METRIC_EVALUATORS

    assert METRIC_EVALUATORS["ocrvqa"] is OCRVQAAccuracyEvaluator


def test_needed_ocr_width():
    from sam_textvqa_tpu.evaluation.evaluator import needed_ocr_width

    batch_mask = np.zeros((4, 10), np.float32)
    batch_mask[1, 6] = 1.0
    batch_mask[3, 2] = 1.0
    assert needed_ocr_width(batch_mask) == 7            # (B, N) batch view
    assert needed_ocr_width(batch_mask[3]) == 3         # (N,) sample view
    assert needed_ocr_width(np.zeros((4, 10))) == 0     # fully padded
