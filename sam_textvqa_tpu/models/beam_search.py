"""Batched on-device beam search.

The reference beam search (sam/beam_search.py) physically repeats every
feature tensor beam_size-fold and reindexes all of them by ``prev_position``
every step (beam_search.py:70-80, 128-133) — and is known-broken (README:68,
float beam indices at :109, score double-counting at :93+:123, a hard
``break`` after one eval batch, evaluator.py:157).

TPU-native redesign, fixed semantics:

* the decode state is (seqs (B,K,T), scores (B,K), done (B,K)); features are
  *never* reindexed — beams of a sample share identical features (the
  reference's per-sample gathers are permutations within each sample's beam
  block, so feature reindexing was always an identity on sample content);
* per-step: log-sigmoid token scores, forced EOS for finished beams
  (score 0, everything else -inf — reference :85-92), beam-0-only at t=0
  (:96-102), top-k over (K * V) per sample, integer divmod recovery of
  (beam, token), gather of sequences/scores/done only;
* scores accumulate once (the reference adds the running total twice);
* runs all T steps under `lax.scan` (forced EOS makes early-exit a no-op).

Returns every beam + its score; the evaluator picks the best per question
(reference evaluator.py:344-351).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .sa_m4c import SAM4C

NEG_INF = -1e30


def _tile_for_beams(tree, beam_size: int):
    """(B, ...) -> (B*K, ...) by interleaved repeat (sample-major)."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree
    )


def beam_search_decode(
    model: SAM4C,
    params,
    batch: Dict[str, jnp.ndarray],
    beam_size: int,
    bos_idx: int,
    eos_idx: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam decode.

    Returns:
      complete_seqs: (B, K, T) int32 — BOS followed by decoded tokens
        (position T-1 token of the final step is dropped, matching the
        reference's add_next_word bound, beam_search.py:168-172).
      topkscores: (B, K) float32 accumulated log-sigmoid scores.
    """
    cfg = model.params_cfg.mmt
    t_max = cfg.num_decoding_steps
    b = batch["train_prev_inds"].shape[0]
    k = beam_size

    encodings = model.apply(
        {"params": params}, batch, method=SAM4C.encode, deterministic=True
    )
    # beams share features: tile encodings + mask inputs once
    tiled_enc = _tile_for_beams(encodings, k)
    tiled_batch = _tile_for_beams(
        {
            key: batch[key]
            for key in (
                "question_mask",
                "pad_obj_mask",
                "pad_ocr_mask",
                "spatial_classes",
            )
        },
        k,
    )

    seqs = jnp.zeros((b, k, t_max), dtype=jnp.int32)
    seqs = seqs.at[:, :, 0].set(bos_idx)
    beam_scores = jnp.zeros((b, k), dtype=jnp.float32)
    done = jnp.zeros((b, k), dtype=bool)

    def step(carry, t):
        seqs, beam_scores, done = carry
        out = model.apply(
            {"params": params},
            tiled_enc,
            tiled_batch,
            seqs.reshape(b * k, t_max),
            method=SAM4C.decode_step,
            deterministic=True,
        )
        logits_t = jax.lax.dynamic_index_in_dim(
            out["scores"], t, axis=1, keepdims=False
        )  # (B*K, V)
        v = logits_t.shape[-1]
        step_scores = jax.nn.log_sigmoid(logits_t.astype(jnp.float32))
        step_scores = step_scores.reshape(b, k, v)
        # finished beams: only EOS continues, at no cost (reference :87-92)
        done_row = jnp.full((v,), NEG_INF).at[eos_idx].set(0.0)
        step_scores = jnp.where(done[:, :, None], done_row[None, None], step_scores)
        total = beam_scores[:, :, None] + step_scores
        # at t=0 all beams are identical: keep only beam 0 (reference :96-102)
        total = jnp.where(
            (t == 0) & (jnp.arange(k)[None, :, None] > 0), NEG_INF, total
        )
        flat = total.reshape(b, k * v)
        values, indices = jax.lax.top_k(flat, k)
        prev_beam = indices // v
        token = indices % v
        seqs = jnp.take_along_axis(seqs, prev_beam[:, :, None], axis=1)
        done = jnp.take_along_axis(done, prev_beam, axis=1)
        # write the chosen token at t+1 (dropped when t+1 == t_max)
        in_range = t + 1 < t_max
        write_pos = jnp.minimum(t + 1, t_max - 1)
        new_col = jnp.where(
            in_range,
            token,
            jnp.take_along_axis(seqs, jnp.full((b, k, 1), write_pos), axis=2)[..., 0],
        )
        seqs = jax.vmap(
            lambda s, c: s.at[:, write_pos].set(c)
        )(seqs, new_col)
        done = done | (token == eos_idx)
        return (seqs, values, done), None

    (seqs, beam_scores, done), _ = jax.lax.scan(
        step, (seqs, beam_scores, done), jnp.arange(t_max)
    )
    return seqs, beam_scores
