"""Beam-search tests: scan implementation vs an independent step-by-step
numpy oracle with the same (fixed) semantics; beam_size=1 vs greedy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.beam_search import beam_search_decode
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams, greedy_decode

NUM_ANSWERS = 20
BOS, EOS = 1, 2


@pytest.fixture(scope="module")
def tiny():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=6, max_ocr_num=4, num_decoding_steps=4, max_seq_length=6,
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
    return task, model, batch, params


def _oracle_beam(model, params, batch, k, t_max):
    """Literal per-step numpy beam search over the same decode_step calls."""
    from sam_textvqa_tpu.models.sa_m4c import SAM4C

    b = batch["train_prev_inds"].shape[0]
    enc = model.apply({"params": params}, batch, method=SAM4C.encode,
                      deterministic=True)
    tiled_enc = jax.tree.map(lambda x: jnp.repeat(x, k, axis=0), enc)
    tiled_batch = {
        key: jnp.repeat(batch[key], k, axis=0)
        for key in ("question_mask", "pad_obj_mask", "pad_ocr_mask", "spatial_classes")
    }
    seqs = np.zeros((b, k, t_max), np.int32)
    seqs[:, :, 0] = BOS
    scores = np.zeros((b, k), np.float64)
    done = np.zeros((b, k), bool)
    for t in range(t_max):
        out = model.apply(
            {"params": params}, tiled_enc, tiled_batch,
            jnp.asarray(seqs.reshape(b * k, t_max)),
            method=SAM4C.decode_step, deterministic=True,
        )
        logits = np.asarray(out["scores"], np.float64)[:, t, :].reshape(b, k, -1)
        v = logits.shape[-1]
        step = np.log(1.0 / (1.0 + np.exp(-logits)))
        for bi in range(b):
            cand = []
            for ki in range(k):
                if t == 0 and ki > 0:
                    continue
                if done[bi, ki]:
                    cand.append((scores[bi, ki], ki, EOS))
                    continue
                for vi in range(v):
                    cand.append((scores[bi, ki] + step[bi, ki, vi], ki, vi))
            cand.sort(key=lambda x: (-x[0], x[1] * v + x[2]))
            top = cand[:k]
            new_seqs = np.stack([seqs[bi, c[1]].copy() for c in top])
            for j, c in enumerate(top):
                if t + 1 < t_max:
                    new_seqs[j, t + 1] = c[2]
            seqs[bi] = new_seqs
            new_done = np.array([done[bi, c[1]] or c[2] == EOS for c in top])
            scores[bi] = [c[0] for c in top]
            done[bi] = new_done
    return seqs, scores


def test_beam_matches_oracle(tiny):
    task, model, batch, params = tiny
    k = 3
    t_max = task.mmt.num_decoding_steps
    seqs, scores = beam_search_decode(model, params, batch, k, BOS, EOS)
    o_seqs, o_scores = _oracle_beam(model, params, batch, k, t_max)
    np.testing.assert_allclose(np.asarray(scores), o_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(seqs), o_seqs)


def test_beam_one_matches_greedy(tiny):
    task, model, batch, params = tiny
    _, pred_greedy = greedy_decode(model, params, batch, bos_idx=BOS)
    seqs, _ = beam_search_decode(model, params, batch, 1, BOS, EOS)
    # beam writes tokens at 1..T-1; greedy pred ids are per-step argmaxes.
    # log-sigmoid is monotone, so beam-1's token at t+1 == greedy argmax at t
    # as long as the beam has not hit EOS.
    seqs = np.asarray(seqs)[:, 0]
    pred = np.asarray(pred_greedy)
    t_max = task.mmt.num_decoding_steps
    for bi in range(pred.shape[0]):
        for t in range(t_max - 1):
            assert seqs[bi, t + 1] == pred[bi, t]
            if pred[bi, t] == EOS:
                break


def test_beam_scores_sorted_and_finite(tiny):
    task, model, batch, params = tiny
    seqs, scores = beam_search_decode(model, params, batch, 4, BOS, EOS)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # descending per sample
    assert np.isfinite(s).all()
