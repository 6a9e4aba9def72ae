"""Config loader and vocab tests: the four reference YAMLs must load
unchanged; VocabDict must mirror the reference semantics."""

import os

import pytest

from sam_textvqa_tpu.config import load_task_config, task_config_from_dict
from sam_textvqa_tpu.data.vocab import VocabDict

from conftest import REFERENCE_ROOT, reference_available

REF_CONFIGS = [
    "train-tvqa-eval-tvqa-c3.yml",
    "train-tvqa-eval-tvqa-c5.yml",
    "train-stvqa-eval-stvqa-c3.yml",
    "train-tvqa_stvqa-eval-tvqa-c3.yml",
]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("name", REF_CONFIGS)
def test_reference_configs_load(name):
    cfg = load_task_config(os.path.join(REFERENCE_ROOT, "configs", name))
    assert cfg.mmt.hidden_size == 768
    assert cfg.mmt.num_spatial_relations == 12
    assert cfg.mmt.layer_type_list == ("n", "n", "s", "s", "s", "s")
    assert cfg.mmt.num_decoding_steps == 12
    assert cfg.mmt.joint_length == 20 + 100 + 50 + 12
    assert cfg.text_bert.num_hidden_layers == 3
    assert cfg.text_bert.lr_scale_text_bert == 0.1
    assert cfg.lr == 1e-4
    assert cfg.lr_decay_iters == (14000, 19000)
    assert cfg.batch_size == 96
    if "c5" in name:
        # single source of truth heals the reference's c5 inconsistency:
        # model mix share5 implies the dataset must build contexts 3 and 5
        assert cfg.spatial_context_keys == ["3", "5"]
    else:
        assert cfg.spatial_context_keys == ["3"]
    if "stvqa" in name and "tvqa_stvqa" not in name:
        assert cfg.train_on == ("stvqa",)
    if "tvqa_stvqa" in name:
        assert set(cfg.train_on) == {"textvqa", "stvqa"}


def test_config_defaults_roundtrip():
    cfg = task_config_from_dict(
        {"SA-M4C": {"hidden_size": 768}, "TextBERT": {}, "lr": 2e-4}
    )
    assert cfg.lr == 2e-4
    assert cfg.mmt.intermediate_size == 3072  # BERT default inherited
    assert cfg.mmt.layer_norm_eps == 1e-12
    assert cfg.text_bert.hidden_dropout_prob == 0.1


def test_vocab_dict(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("<pad>\n<s>\n</s>\nred\nstop\n")
    v = VocabDict(str(p))
    # <unk> is prepended when missing (reference textvqa_vocab.py:31-33)
    assert v.word_list[0] == "<unk>"
    assert v.word2idx("red") == 4
    assert v.word2idx("never-seen") == v.UNK_INDEX == 0


def test_special_ids():
    v = VocabDict(["<pad>", "<s>", "</s>", "<unk>", "red"])
    ids = v.special_ids()
    assert (ids.pad, ids.bos, ids.eos, ids.unk) == (0, 1, 2, 3)
    assert ids.num_vocab == 5
