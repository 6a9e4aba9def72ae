"""Golden regression fixtures: pin host-side preprocessing behavior against
accidental drift across refactors. The expected values were produced by the
reference-parity-verified implementations (see oracle tests) and must stay
byte-stable."""

import numpy as np

from sam_textvqa_tpu.data.processors import M4CAnswerProcessor
from sam_textvqa_tpu.data.vocab import VocabDict
from sam_textvqa_tpu.evaluation.metrics import EvalAIAnswerProcessor
from sam_textvqa_tpu.ops.phoc import build_phoc
from sam_textvqa_tpu.ops.spatial_graph import build_spatial_graph

GOLDEN_BOXES = np.array(
    [
        [0.10, 0.10, 0.90, 0.90],
        [0.20, 0.20, 0.40, 0.40],
        [0.60, 0.60, 0.80, 0.80],
        [0.15, 0.60, 0.35, 0.85],
        [0.62, 0.12, 0.88, 0.38],
        [0.00, 0.00, 0.00, 0.00],
    ]
)

# verified bit-equal to the reference scalar loop (tests/test_spatial_graph)
GOLDEN_CLASSES = np.array(
    [
        [12, 1, 1, 1, 1, 0],
        [2, 12, 8, 10, 7, 0],
        [2, 4, 12, 11, 6, 0],
        [2, 6, 7, 12, 7, 0],
        [2, 11, 10, 11, 12, 0],
        [0, 0, 0, 0, 0, 0],
    ],
    dtype=np.int8,
)


def test_golden_spatial_graph():
    np.testing.assert_array_equal(build_spatial_graph(GOLDEN_BOXES), GOLDEN_CLASSES)


def test_golden_phoc():
    # verified bit-equal to the compiled reference cphoc.c (tests/test_phoc)
    v = build_phoc("stop")
    hot = np.nonzero(v)[0].tolist()
    assert hot == [
        18, 19, 50, 51, 90, 122, 127, 159, 198, 235, 266, 303, 342, 379,
        446, 483, 512, 518, 568,
    ]
    assert build_phoc("").sum() == 0


def test_golden_evalai_normalizer():
    p = EvalAIAnswerProcessor()
    cases = {
        "The STOP Sign": "stop sign",
        "twenty two": "twenty 2",
        "It's a Cat!": "it 's cat",
        "3,000": "3000",
        "u.s.a.": "usa",
    }
    for raw, expect in cases.items():
        assert p(raw) == expect, (raw, p(raw))


def test_golden_answer_targets():
    vocab = VocabDict(["<pad>", "<s>", "</s>", "<unk>", "red", "stop", "sign"])
    proc = M4CAnswerProcessor(vocab, max_copy_steps=4, num_answers=10,
                              max_ocr_tokens=4)
    match = proc.match(["stop sign"] * 10, ["stop", "go", "sign", "stop"])
    # "stop" -> vocab 5, ocr 0 (+7), ocr 3 (+7); "sign" -> vocab 6, ocr 2
    assert sorted({s[0] for s in match.idx_seqs}) == [5, 7, 10]
    assert all(len(s) == 2 for s in match.idx_seqs)
    # 6 unique sequences x 10 identical answers — duplicates kept so the
    # random teacher-forcing sample weights sequences like the reference
    assert len(match.idx_seqs) == 60
    assert sorted(set(match.idx_seqs)) == [
        (5, 6), (5, 9), (7, 6), (7, 9), (10, 6), (10, 9)
    ]
    assert match.step0_scores == [(5, 1.0), (7, 1.0), (10, 1.0)]
    sampled = proc.sample_decoding_targets(match, np.random.RandomState(0))
    assert sampled["train_prev_inds"][0] == 1  # BOS
    assert sampled["train_loss_mask"].tolist() == [1.0, 1.0, 1.0, 0.0]
    # step 1 activates "sign" in both vocab (6) and ocr (9) index spaces
    step1_hot = np.nonzero(sampled["targets"][1])[0].tolist()
    assert step1_hot == [6, 9]
    # step 2 is EOS
    assert np.nonzero(sampled["targets"][2])[0].tolist() == [2]
