"""AOT inference artifacts (serving/artifact.py): jax.export round trip —
serialize the decode grid to StableHLO bytes on disk, reload WITHOUT model
Python, and match the live jitted decode bit-for-bit."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import SyntheticDataset
from sam_textvqa_tpu.data.vocab import VocabDict
from sam_textvqa_tpu.models.fast_decode import greedy_decode_fast
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.serving.artifact import (
    MANIFEST,
    export_decode_artifact,
    load_decode_artifact,
)


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
    ds = SyntheticDataset(task, 8, num_answers_vocab=len(vocab))
    batch = {
        k: jnp.asarray(v)
        for k, v in ds.get_batch(range(2)).items()
        if not k.startswith("_") and k != "question_id"
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, vocab, ds, params


def _device_batch(ds, rows):
    batch = ds.get_batch(range(rows))
    return {
        k: np.asarray(v)
        for k, v in batch.items()
        if not k.startswith("_") and k != "question_id"
    }


@pytest.fixture(scope="module")
def artifact_dir(setup, tmp_path_factory):
    task, model, vocab, ds, params = setup
    out = str(tmp_path_factory.mktemp("artifact"))
    special = vocab.special_ids()
    manifest = export_decode_artifact(
        model, params, out,
        bos=special.bos, eos=special.eos,
        buckets=(2, 4), ocr_buckets=(4,),
    )
    return out, manifest


def test_export_writes_grid_and_manifest(artifact_dir, setup):
    out, manifest = artifact_dir
    task = setup[0]
    # (full, ocr-4) x buckets (2, 4) = 4 cells
    assert len(manifest["cells"]) == 4
    names = {c["name"] for c in manifest["cells"]}
    assert names == {"decode_b2", "decode_b4", "decode_b2_c4", "decode_b4_c4"}
    for c in manifest["cells"]:
        p = os.path.join(out, c["name"] + ".stablehlo")
        assert os.path.getsize(p) == c["bytes"] > 0
    with open(os.path.join(out, MANIFEST)) as f:
        ondisk = json.load(f)
    assert ondisk["format"].startswith("sam_textvqa_tpu.decode_artifact")
    assert ondisk["num_decoding_steps"] == task.mmt.num_decoding_steps
    assert "cpu" in ondisk["platforms"]


def test_artifact_matches_live_decode_and_routes_narrow(artifact_dir, setup):
    task, model, vocab, ds, params = setup
    out, _ = artifact_dir
    art = load_decode_artifact(out)
    special = vocab.special_ids()

    live = jax.jit(
        lambda p, b: greedy_decode_fast(
            model, p, b, special.bos, backend="xla", eos_idx=special.eos
        )
    )

    batch = _device_batch(ds, 3)  # -> bucket 4 with one padded row
    # synthetic OCR masks may be full-width; force a <=4-slot batch so the
    # router picks the c4 cell (mask-only truncation keeps answers exact)
    batch["pad_ocr_mask"][:, 4:] = 0.0
    scores_live, pred_live = live(params, dict(batch))
    scores_art, pred_art = art.call(params, batch)

    assert pred_art.shape == pred_live.shape
    np.testing.assert_array_equal(np.asarray(pred_art), np.asarray(pred_live))
    # the router must have picked the narrow OCR cell at bucket 4
    assert art._pick(3, 8, 4) == (4, None, 4)


def test_artifact_pads_single_row_to_smallest_bucket(artifact_dir, setup):
    task, model, vocab, ds, params = setup
    out, _ = artifact_dir
    art = load_decode_artifact(out)
    special = vocab.special_ids()
    batch = _device_batch(ds, 1)
    live = jax.jit(
        lambda p, b: greedy_decode_fast(
            model, p, b, special.bos, backend="xla", eos_idx=special.eos
        )
    )
    _, pred_live = live(params, dict(batch))
    scores, pred = art.call(params, batch)
    assert pred.shape[0] == 1 and scores.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred_live))


def test_artifact_raises_when_nothing_fits(artifact_dir, setup):
    task, model, vocab, ds, params = setup
    out, _ = artifact_dir
    art = load_decode_artifact(out)
    with pytest.raises(ValueError, match="no exported cell"):
        art._pick(9, 8, 6)  # 9 rows > largest exported bucket (4)


def test_artifact_routing_uses_last_nonzero_not_count(artifact_dir, setup):
    """A NON-CONTIGUOUS pad mask (client zeroed a middle slot in place)
    must route by last-nonzero-column + 1, exactly like the live engine's
    needed_width — counting nonzero slots would pick a too-narrow cell and
    silently slice off the real token past the gap."""
    task, model, vocab, ds, params = setup
    out, _ = artifact_dir
    art = load_decode_artifact(out)

    batch = _device_batch(ds, 2)
    # 2 real OCR slots but the last one at index 5 (> rung 4): needs full 6
    batch["pad_ocr_mask"][:] = 0.0
    batch["pad_ocr_mask"][:, 0] = 1.0
    batch["pad_ocr_mask"][:, 5] = 1.0
    special = vocab.special_ids()
    live = jax.jit(
        lambda p, b: greedy_decode_fast(
            model, p, b, special.bos, backend="xla", eos_idx=special.eos
        )
    )
    _, pred_live = live(params, dict(batch))
    # the router must NOT pick the c4 cell (2 slots would fit by count)
    assert art._pick(2, 8, 6) == (2, None, None)
    _, pred_art = art.call(params, batch)
    np.testing.assert_array_equal(np.asarray(pred_art), np.asarray(pred_live))


def test_export_embeds_answer_vocab(setup, tmp_path):
    """answer_vocab=... writes the word list into the artifact dir in
    VocabDict's newline format (config-free serving); a wrong-sized vocab
    is refused."""
    from sam_textvqa_tpu.data.vocab import VocabDict
    from sam_textvqa_tpu.serving.artifact import VOCAB_FILE

    task, model, vocab, ds, params = setup
    out = str(tmp_path / "with_vocab")
    special = vocab.special_ids()
    export_decode_artifact(
        model, params, out, bos=special.bos, eos=special.eos,
        buckets=(2,), answer_vocab=vocab,
    )
    reloaded = VocabDict(os.path.join(out, VOCAB_FILE))
    assert reloaded.word_list == vocab.word_list

    wrong = VocabDict(list(vocab.word_list) + ["extra"])
    with pytest.raises(ValueError, match="words"):
        export_decode_artifact(
            model, params, str(tmp_path / "bad"), bos=special.bos,
            eos=special.eos, buckets=(2,), answer_vocab=wrong,
        )


def test_beam_artifact_matches_live_beam_decode(setup, tmp_path):
    """Beam cells (manifest beam_size > 1) reduce to the best beam ON
    DEVICE exactly like the live engine's beam fn — exported bytes must
    reproduce the live (scores, pred) pair bit-for-bit."""
    import jax.numpy as jnp

    from sam_textvqa_tpu.models.fast_decode import beam_search_decode_fast

    task, model, vocab, ds, params = setup
    special = vocab.special_ids()
    out = str(tmp_path / "beam_art")
    export_decode_artifact(
        model, params, out, bos=special.bos, eos=special.eos,
        buckets=(2,), beam_size=2,
    )
    art = load_decode_artifact(out)
    assert art.manifest["beam_size"] == 2

    @jax.jit
    def live(p, b):
        seqs, scores = beam_search_decode_fast(
            model, p, b, 2, special.bos, special.eos, early_exit=True
        )
        best = jnp.argmax(scores, axis=1)
        pred = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0, 1:]
        return scores, pred

    batch = _device_batch(ds, 2)
    scores_live, pred_live = live(params, dict(batch))
    scores_art, pred_art = art.call(params, batch)
    np.testing.assert_array_equal(np.asarray(pred_art), np.asarray(pred_live))
    np.testing.assert_array_equal(
        np.asarray(scores_art), np.asarray(scores_live)
    )
