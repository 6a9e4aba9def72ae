"""Data pipeline tests: answer-target construction against the reference
M4CAnswerProcessor (with matched RNG streams), dataset assembly, batching,
concat datasets, and the imdb loader."""

import os

import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.dataset import (
    ConcatDataset,
    EpochBatcher,
    SAMDataset,
    build_dataset,
)
from sam_textvqa_tpu.data.features import DictFeatureSource, normalize_boxes
from sam_textvqa_tpu.data.processors import (
    M4CAnswerProcessor,
    SimpleWordpieceTokenizer,
    match_answer_to_vocab_ocr_seq,
    word_cleaner,
)
from sam_textvqa_tpu.data.vocab import VocabDict

from conftest import reference_available, load_reference_processors

VOCAB_WORDS = ["<pad>", "<s>", "</s>", "<unk>", "red", "stop", "sign", "yes",
               "no", "coca", "cola", "2", "exit"]


def _vocab():
    return VocabDict(VOCAB_WORDS)


def test_word_cleaner():
    # lowercase; "," and "?" stripped; "'s" becomes " 's"
    assert word_cleaner("What's UP,?") == "what 's up"
    # exact reference semantics checked against oracle below


def test_match_answer_sequences():
    v = _vocab()
    ocr2inds = {"stop": [0, 3], "sign": [1]}
    seqs = match_answer_to_vocab_ocr_seq("stop sign", v.word2idx_dict, ocr2inds)
    num_vocab = len(v)
    # "stop" -> vocab 5, ocr 0 (+nv), ocr 3 (+nv); "sign" -> vocab 6, ocr 1
    firsts = {s[0] for s in seqs}
    assert firsts == {5, num_vocab + 0, num_vocab + 3}
    assert all(len(s) == 2 for s in seqs)
    assert len(seqs) == 6
    assert match_answer_to_vocab_ocr_seq("zebra", v.word2idx_dict, {}) == []


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_targets_match_reference_processor(tmp_path):
    """Same RNG stream -> bit-identical targets/prev_inds/masks vs the
    reference M4CAnswerProcessor (processors.py:586-692)."""
    ref_mod = load_reference_processors()
    from easydict import EasyDict as edict

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB_WORDS) + "\n")
    ref_mod.registry["Vocabs"] = {"vocab5k": str(vocab_file)}

    cfg = edict(
        {"vocab_type": "5k", "num_answers": 10, "max_ocr_tokens": 8,
         "max_copy_steps": 6}
    )
    ref_proc = ref_mod.M4CAnswerProcessor(cfg)

    ours = M4CAnswerProcessor(
        _vocab(), max_copy_steps=6, num_answers=10, max_ocr_tokens=8
    )

    cases = [
        (["stop sign"] * 4 + ["stop"] * 3 + ["red stop"] * 3,
         ["stop", "sign", "stop", "go", "red"]),
        (["yes"] * 10, ["yes", "no"]),
        (["unanswerable"] * 10, ["stop"]),          # no match at all
        (["coca cola"] * 5 + ["cola"] * 5, ["coca", "cola", "coca"]),
        (["2"] * 10, ["2", "two", "2"]),
        (["exit"] * 9 + ["stop"], []),              # no OCR tokens
    ]
    for seed, (answers, ocr) in enumerate(cases):
        np.random.seed(seed)
        ref_out = ref_proc({"answers": list(answers), "context_tokens": list(ocr)})
        match = ours.match(answers, ocr)
        sampled = ours.sample_decoding_targets(match, np.random.RandomState(seed))
        np.testing.assert_array_equal(
            sampled["train_prev_inds"], ref_out["train_prev_inds"].numpy(),
            err_msg=f"case {seed} prev_inds",
        )
        np.testing.assert_array_equal(
            sampled["train_loss_mask"], ref_out["train_loss_mask"].numpy(),
            err_msg=f"case {seed} loss_mask",
        )
        np.testing.assert_allclose(
            sampled["targets"], ref_out["targets"].numpy(),
            err_msg=f"case {seed} targets", atol=0,
        )


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_word_cleaner_matches_reference():
    ref_mod = load_reference_processors()
    for w in ["What's UP,?", "STOP, sign?", "it's", "a,b?c's", "  x  "]:
        assert word_cleaner(w) == ref_mod.Processors.word_cleaner(w)


def _fake_sources(n_images=4, seed=0):
    rng = np.random.RandomState(seed)
    obj, ocr = {}, {}
    for i in range(n_images):
        for table, n in ((obj, 7), (ocr, 3)):
            boxes = rng.rand(n, 4) * 100
            boxes[:, 2:] += boxes[:, :2]
            table[f"img{i}"] = {
                "features": rng.randn(n, 2048).astype(np.float32),
                "boxes": boxes.astype(np.float32),
                "image_w": 200,
                "image_h": 100,
            }
    return DictFeatureSource(obj), DictFeatureSource(ocr)


def _task(tmp_path):
    return task_config_from_dict(
        {
            "SA-M4C": {"max_obj_num": 10, "max_ocr_num": 5,
                       "num_decoding_steps": 6, "max_seq_length": 8},
            "TextBERT": {},
            "max_obj_num": 10, "max_ocr_num": 5, "max_seq_length": 8,
            "textvqa_imdb": str(tmp_path / "imdb_{}.npy"),
            "mix_list": ["none", "none", "share3", "share3", "share3", "share3"],
        }
    )


def _write_imdb(tmp_path, split="train", n=6):
    entries = [{"metadata": True}]
    for i in range(n):
        entries.append(
            {
                "question": f"what does sign {i} say",
                "question_id": 100 - i,  # unsorted on purpose
                "image_id": f"img{i % 4}",
                "image_height": 100,
                "image_width": 200,
                "answers": ["stop"] * 10,
                "google_ocr_tokens_filtered": ["STOP", "sign?"],
            }
        )
    path = tmp_path / f"imdb_{split}.npy"
    np.save(path, np.array(entries, dtype=object), allow_pickle=True)
    return str(path)


def test_build_dataset_and_batching(tmp_path):
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    task = _task(tmp_path)
    _write_imdb(tmp_path)
    obj_src, ocr_src = _fake_sources()
    ds = build_dataset(
        task, "textvqa", "train", SimpleWordpieceTokenizer(),
        FastTextProcessor(), _vocab(), obj_src, ocr_src,
    )
    assert len(ds) == 6
    # sorted by question_id
    assert list(ds.packed.question_id) == sorted(ds.packed.question_id)
    rng = np.random.RandomState(0)
    batch = ds.get_batch([0, 1, 2], rng)
    assert batch["pad_obj_features"].shape == (3, 10, 2048)
    assert batch["ocr_phoc"].shape == (3, 5, 604)
    assert batch["spatial_classes"].shape == (3, 15, 15)
    assert batch["targets"].shape == (3, 6, len(_vocab()) + 5)
    # ocr cleaned: "STOP" -> "stop", "sign?" -> "sign"
    assert batch["_ocr_tokens"][0][:2] == ["stop", "sign"]
    # answers "stop" match OCR slot 0 and vocab id 5 -> targets nonzero
    assert batch["targets"].sum() > 0
    assert batch["train_loss_mask"].sum() > 0
    # spatial graph has 12 on the diagonal for valid boxes
    assert (np.diagonal(batch["spatial_classes"], axis1=1, axis2=2) == 12).sum() == 3 * 10


def test_epoch_batcher_padding_and_shuffle(tmp_path):
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    task = _task(tmp_path)
    _write_imdb(tmp_path)
    obj_src, ocr_src = _fake_sources()
    ds = build_dataset(
        task, "textvqa", "train", SimpleWordpieceTokenizer(),
        FastTextProcessor(), _vocab(), obj_src, ocr_src,
    )
    batcher = EpochBatcher(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(batcher.epoch_batches())
    assert len(batches) == 2
    assert all(b["question_indices"].shape[0] == 4 for b in batches)
    assert batches[1]["_real_count"] == 2  # 6 = 4 + 2(padded to 4)
    order1 = [b["question_id"].tolist() for b in batches]
    batches2 = list(batcher.epoch_batches())  # next epoch reshuffles
    order2 = [b["question_id"].tolist() for b in batches2]
    assert order1 != order2


def test_concat_dataset(tmp_path):
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    task = _task(tmp_path)
    _write_imdb(tmp_path)
    obj_src, ocr_src = _fake_sources()
    d1 = build_dataset(task, "textvqa", "train", SimpleWordpieceTokenizer(),
                       FastTextProcessor(), _vocab(), obj_src, ocr_src)
    d2 = build_dataset(task, "textvqa", "train", SimpleWordpieceTokenizer(),
                       FastTextProcessor(), _vocab(), obj_src, ocr_src)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 12
    batch = cat.get_batch([0, 7, 5, 11], np.random.RandomState(0))
    assert batch["question_indices"].shape[0] == 4
    # position alignment: index 7 == d2 index 1
    ref = d2.get_batch([1], np.random.RandomState(0))
    np.testing.assert_array_equal(
        batch["question_indices"][1], ref["question_indices"][0]
    )


def test_normalize_boxes():
    boxes = np.array([[10.0, 20.0, 110.0, 70.0]])
    out = normalize_boxes(boxes, 200, 100)
    np.testing.assert_allclose(out[0, :4], [0.05, 0.2, 0.55, 0.7])
    np.testing.assert_allclose(out[0, 4], (100 * 50) / (200 * 100))


def test_stvqa_string_question_ids(tmp_path):
    """ST-VQA imdbs carry string question_ids and derive feature keys from
    image_path (reference stvqa_dataset.py:58); the real string ids must
    survive preprocessing into question_id_raw / _question_id_raw."""
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    entries = [{"metadata": True}]
    for i in range(4):
        entries.append(
            {
                "question": f"what does sign {i} say",
                "question_id": f"q_{chr(ord('d') - i)}{i}",  # unsorted strings
                "image_path": f"img{i % 4}.jpg",
                "image_height": 100,
                "image_width": 200,
                "answers": ["stop"] * 10,
                "google_ocr_tokens_filtered": ["STOP"],
            }
        )
    np.save(tmp_path / "imdb_train.npy",
            np.array(entries, dtype=object), allow_pickle=True)

    task = task_config_from_dict(
        {
            "SA-M4C": {"max_obj_num": 10, "max_ocr_num": 5,
                       "num_decoding_steps": 6, "max_seq_length": 8},
            "TextBERT": {},
            "max_obj_num": 10, "max_ocr_num": 5, "max_seq_length": 8,
            "stvqa_imdb": str(tmp_path / "imdb_{}.npy"),
            "mix_list": ["none", "none", "share3", "share3", "share3", "share3"],
        }
    )
    # stvqa feature keys are image_path with .npy extension
    raw_obj, raw_ocr = _fake_sources()
    obj_src = DictFeatureSource(
        {f"{k}.npy": v for k, v in raw_obj.table.items()})
    ocr_src = DictFeatureSource(
        {f"{k}.npy": v for k, v in raw_ocr.table.items()})
    ds = build_dataset(
        task, "stvqa", "train", SimpleWordpieceTokenizer(),
        FastTextProcessor(), _vocab(), obj_src, ocr_src,
    )
    expected = sorted(e["question_id"] for e in entries[1:])
    assert ds.packed.question_id_raw == expected
    batch = ds.get_batch([0, 2], np.random.RandomState(0))
    assert batch["_question_id_raw"] == [expected[0], expected[2]]
    # int surrogates remain positional for device arrays
    assert batch["question_id"].tolist() == [0, 2]


def test_fasttext_npz_table(tmp_path):
    """Precomputed {word: vec} npz table is a config-driven replacement for
    wiki.en.bin (reference processors.py:191-226)."""
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    rng = np.random.RandomState(0)
    words = np.array(["stop", "sign", "exit"])
    vectors = rng.randn(3, 16).astype(np.float32)
    path = tmp_path / "ft.npz"
    np.savez(path, words=words, vectors=vectors)

    proc = FastTextProcessor(table_path=str(path))
    assert not proc.is_fallback
    assert proc.dim == 16
    out = proc(["stop", "exit", "unknown"], max_length=4)
    np.testing.assert_array_equal(out[0], vectors[0])
    np.testing.assert_array_equal(out[1], vectors[2])
    np.testing.assert_array_equal(out[2], np.zeros(16))  # OOV -> zeros
    np.testing.assert_array_equal(out[3], np.zeros(16))  # padding
    # multi-word token averages its parts (reference :212-215)
    np.testing.assert_allclose(
        proc._vector("stop sign"), (vectors[0] + vectors[1]) / 2, rtol=1e-6
    )


def test_hash_fallbacks_cross_process_deterministic():
    """The tokenizer/fastText fallbacks must not depend on PYTHONHASHSEED —
    otherwise preprocessing caches written by one process disagree with
    tokenization in the next."""
    import subprocess
    import sys

    code = (
        "from sam_textvqa_tpu.data.processors import "
        "SimpleWordpieceTokenizer, FastTextProcessor\n"
        "import numpy as np\n"
        "ids = SimpleWordpieceTokenizer().encode('what does the sign say')\n"
        "vec = FastTextProcessor()._vector('stop')\n"
        "print(ids, repr(float(np.sum(vec))))\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = []
    for seed in ("0", "31337"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, cwd=repo,
        )
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1]


def test_rebase_image_id_path_surgery():
    """Reference _image_features_reader.py:94-117: scene-text ids rebase
    onto the LMDB's stored root (components up to the first 'task' part);
    ocr-vqa stored keys prefix requested ids with their dirname."""
    from sam_textvqa_tpu.data.features import rebase_image_id

    # ST-VQA: dataset-derived id under a different root than the LMDB keys
    sample = "/srv/features/scene-text/task3/train/imgs/00001.jpg"
    req = "/home/user/data/scene-text/task3/train/imgs/00042.jpg"
    assert rebase_image_id(req, sample) == (
        "/srv/features/scene-text/task3/train/imgs/00042.jpg"
    )
    # relative requested id still rebases from its own 'task' component
    assert rebase_image_id("scene-text/task_2/x/7.jpg",
                           "/srv/feat/scene-text/task_2/y/1.jpg") == (
        "/srv/feat/scene-text/task_2/x/7.jpg"
    )
    # OCR-VQA: stored keys are full paths, requested ids bare filenames
    assert rebase_image_id("5678.jpg", "/data/ocr-vqa/images/1234.jpg") == (
        "/data/ocr-vqa/images/5678.jpg"
    )
    # TextVQA ids (plain image ids) pass through untouched
    assert rebase_image_id("0054c91f9ffd9477", "0a5b9a7f3b8e2c11") == (
        "0054c91f9ffd9477"
    )


def test_lmdb_source_resolves_rebased_keys():
    """LmdbFeatureSource must route lookups through the rebase (unit-tested
    without the absent ``lmdb`` package by faking the opened state)."""
    from sam_textvqa_tpu.data.features import LmdbFeatureSource

    src = object.__new__(LmdbFeatureSource)
    stored = [
        b"/srv/features/scene-text/task3/imgs/00001.jpg",
        b"/srv/features/scene-text/task3/imgs/00042.jpg",
    ]
    src._image_ids = set(stored)
    src._sample_id = stored[0].decode()
    assert "/other/root/scene-text/task3/imgs/00042.jpg" in src
    assert "/other/root/scene-text/task3/imgs/99999.jpg" not in src

    src2 = object.__new__(LmdbFeatureSource)
    stored2 = [b"/data/ocr-vqa/images/1234.jpg", b"/data/ocr-vqa/images/5678.jpg"]
    src2._image_ids = set(stored2)
    src2._sample_id = stored2[0].decode()
    assert "5678.jpg" in src2
    assert "0000.jpg" not in src2


def test_epoch_batcher_process_sharding_slicing_invariant(tmp_path):
    """Per-process slices concatenate to exactly the full-assembly batch —
    including the rng-sampled supervision (per-row streams keyed by global
    position), so multi-host sharded input is bit-equal to single-host."""
    from sam_textvqa_tpu.data.processors import FastTextProcessor

    task = _task(tmp_path)
    _write_imdb(tmp_path)
    obj_src, ocr_src = _fake_sources()
    ds = build_dataset(
        task, "textvqa", "train", SimpleWordpieceTokenizer(),
        FastTextProcessor(), _vocab(), obj_src, ocr_src,
    )
    full = list(EpochBatcher(ds, 4, shuffle=True, seed=7).epoch_batches())
    halves = [
        list(EpochBatcher(ds, 4, shuffle=True, seed=7, process_index=pi,
                          process_count=2).epoch_batches())
        for pi in range(2)
    ]
    assert len(halves[0]) == len(full)
    for bi, fb in enumerate(full):
        assert halves[0][bi]["question_indices"].shape[0] == 2
        for key in ("question_indices", "targets", "train_prev_inds",
                    "train_loss_mask", "question_id", "pad_obj_features"):
            merged = np.concatenate(
                [halves[0][bi][key], halves[1][bi][key]], axis=0
            )
            np.testing.assert_array_equal(merged, fb[key], err_msg=key)
        # real counts split across the slices sum to the global real count
        assert (halves[0][bi]["_real_count"] + halves[1][bi]["_real_count"]
                == fb["_real_count"])
