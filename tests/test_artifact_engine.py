"""Artifact-backed serving (serving/artifact_engine.py): the full online
engine running on DESERIALIZED StableHLO decode cells — answers must match
the live (model-Python, jitted) engine exactly, including width-ladder
routing and bucket padding; the manifest is the single source of the
routing grid."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import SyntheticDataset
from sam_textvqa_tpu.data.vocab import VocabDict
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.serving import ServingEngine
from sam_textvqa_tpu.serving.artifact import export_decode_artifact
from sam_textvqa_tpu.serving.artifact_engine import (
    ArtifactServingEngine,
    engine_from_artifact,
)
from sam_textvqa_tpu.serving.engine import SAMPLE_KEYS


@pytest.fixture(scope="module")
def setup():
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4,
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


def _samples(ds, n, ocr_cap=None):
    batch = ds.get_batch(range(n))
    out = []
    for i in range(n):
        s = {k: np.asarray(batch[k][i]).copy() for k in SAMPLE_KEYS}
        if ocr_cap is not None:
            s["pad_ocr_mask"][ocr_cap:] = 0.0
        s["ocr_tokens"] = batch["_ocr_tokens"][i]
        out.append(s)
    return out


@pytest.fixture(scope="module")
def artifact_dir(setup, tmp_path_factory):
    task, model, vocab, ds, params = setup
    out = str(tmp_path_factory.mktemp("art_engine"))
    special = vocab.special_ids()
    export_decode_artifact(
        model, params, out,
        bos=special.bos, eos=special.eos,
        buckets=(1, 4), ocr_buckets=(4,),
    )
    return out


def test_artifact_engine_matches_live_engine(setup, artifact_dir):
    """Same requests through the live jitted engine and the artifact-backed
    one (no model given at all): identical answers. OCR masks are capped at
    4 slots so batches exercise the ladder cell, not just full width."""
    task, model, vocab, ds, params = setup
    samples = _samples(ds, 12, ocr_cap=4)

    live = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0,
        ocr_buckets=(4,),
    )
    live.warmup()
    with live:
        want = [f.result(timeout=60)["answer"]
                for f in live.submit_many(samples)]

    engine = engine_from_artifact(artifact_dir, params, vocab,
                                  max_wait_ms=20.0)
    # routing grid comes from the manifest, not constructor args
    assert engine.buckets == [1, 4]
    assert engine.ladder_widths == [4]
    assert engine.obj_ladder_widths == []
    engine.warmup()
    with engine:
        got = [f.result(timeout=60)["answer"]
               for f in engine.submit_many(samples)]
    assert got == want
    s = engine.stats.summary()
    assert s["requests"] == 12
    # capped requests must actually have routed through the c4 rung
    assert sum(s["ocr_width_occupancy"].values()) == s["batches"]


def test_artifact_engine_full_width_requests(setup, artifact_dir):
    """Requests that DON'T fit the ladder rung route to the full-width
    cell and still answer identically to the live engine."""
    task, model, vocab, ds, params = setup
    samples = _samples(ds, 4)  # synthetic masks may need all 6 OCR slots

    live = ServingEngine(model, params, vocab, buckets=(1, 4),
                         max_wait_ms=20.0)
    live.warmup()
    with live:
        want = [f.result(timeout=60)["answer"]
                for f in live.submit_many(samples)]

    engine = engine_from_artifact(artifact_dir, params, vocab,
                                  max_wait_ms=20.0)
    with engine:
        got = [f.result(timeout=60)["answer"]
               for f in engine.submit_many(samples)]
    assert got == want


def test_artifact_engine_rejects_pruned_grid(setup, artifact_dir, tmp_path):
    """A hand-pruned artifact (missing a cross-product cell) must fail at
    construction, not mid-request."""
    import os
    import shutil

    from sam_textvqa_tpu.serving.artifact import DecodeArtifact

    pruned = tmp_path / "pruned"
    shutil.copytree(artifact_dir, pruned)
    art = DecodeArtifact(str(pruned))
    del art.cells[(4, None, 4)]
    task, model, vocab, ds, params = setup
    with pytest.raises(ValueError, match="not a full cross product"):
        ArtifactServingEngine(art, params, vocab)


def test_artifact_engine_validates_requests(setup, artifact_dir):
    """Submit-time schema validation (shapes off the MANIFEST) still
    protects batches."""
    task, model, vocab, ds, params = setup
    engine = engine_from_artifact(artifact_dir, params, vocab)
    good = _samples(ds, 1)[0]
    bad = dict(good)
    bad["pad_ocr_mask"] = np.zeros(3, np.float32)  # wrong width
    with engine:
        with pytest.raises(ValueError, match="shape"):
            engine.submit(bad)
        # the good one still serves
        assert engine.submit(good).result(timeout=60)["answer"]


def test_artifact_engine_rejects_mismatched_vocab(setup, artifact_dir):
    """An artifact served with the wrong vocab would decode every answer
    against the wrong word list; the manifest's bos/eos/num_answers make
    the mismatch detectable at construction."""
    from sam_textvqa_tpu.data.vocab import VocabDict

    task, model, vocab, ds, params = setup
    longer = VocabDict(list(vocab.word_list) + ["extra1", "extra2"])
    with pytest.raises(ValueError, match="answer"):
        engine_from_artifact(artifact_dir, params, longer)
