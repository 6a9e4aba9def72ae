"""Multimodal transformer (MMT) over the joint
[question; objects; OCR; decoder] stream, with interleaved normal/spatial
layers, previous-prediction embeddings, and the OCR pointer network.

Reference: MMT / BertSpatialEncoder / PrevPredEmbeddings / OcrPtrNet in
sam/sa_m4c.py:687-948. Capability-identical, TPU-first:

* prefix-LM + causal-decoder mask kept boolean until the softmax;
* each spatial context key's combined mask is built once per forward and
  shared across the layers consuming it (the reference rebuilds per layer);
* output slicing uses static offsets (all lengths are fixed).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import MATRIX_TYPE_MAP, MMTConfig
from ..ops.spatial_graph import relation_head_lut
from .bert import BertLayer
from .layers import Dense, LayerNormTF, MASK_BIAS, causal_mask
from .spatial import SpatialBertLayer, build_spatial_allowed


class PrevPredEmbeddings(nn.Module):
    """Embeddings of previous decoding steps (reference sa_m4c.py:900-948).

    The answer-vocab embedding table is the (tied) classifier weight; OCR
    token embeddings are the OCR encoder outputs. Position + type embeddings
    are added after a shared LayerNorm.
    """

    hidden_size: int = 768
    hidden_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    MAX_DEC_LENGTH = 100
    MAX_TYPE_NUM = 5

    @nn.compact
    def __call__(self, ans_emb, ocr_emb, prev_inds, deterministic=True):
        b, seq_len = prev_inds.shape
        ans_num = ans_emb.shape[0]

        ans_emb = LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="ans_layer_norm"
        )(ans_emb.astype(self.dtype))
        ocr_emb = LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="ocr_layer_norm"
        )(ocr_emb)
        # The reference concatenates [ans_emb (broadcast to batch); ocr_emb]
        # and batch-gathers (sa_m4c.py:932-934). Materializing that
        # (B, vocab+OCR, D) table costs ~0.5 GB per step at batch 64; an
        # equivalent two-gather select reads only what's indexed.
        prev = prev_inds.astype(jnp.int32)
        is_vocab = prev < ans_num
        from_vocab = jnp.take(
            ans_emb, jnp.where(is_vocab, prev, 0), axis=0
        )
        from_ocr = jnp.take_along_axis(
            ocr_emb,
            jnp.where(is_vocab, 0, prev - ans_num)[:, :, None],
            axis=1,
        )
        raw_dec_emb = jnp.where(is_vocab[:, :, None], from_vocab, from_ocr)

        position_embeddings = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.MAX_DEC_LENGTH, self.hidden_size),
            jnp.float32,
        )
        token_type_embeddings = self.param(
            "token_type_embeddings",
            nn.initializers.normal(0.02),
            (self.MAX_TYPE_NUM, self.hidden_size),
            jnp.float32,
        )
        # type 0 = fixed vocab, 1 = OCR copy (reference :940-942)
        token_type_ids = (prev_inds >= ans_num).astype(jnp.int32)
        emb = (
            position_embeddings[None, :seq_len]
            + jnp.take(token_type_embeddings, token_type_ids, axis=0)
        ).astype(self.dtype)
        emb = LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="emb_layer_norm"
        )(emb)
        emb = nn.Dropout(rate=self.hidden_dropout_prob)(
            emb, deterministic=deterministic
        )
        return raw_dec_emb + emb


class OcrPtrNet(nn.Module):
    """Pointer network scoring decoder states against OCR outputs
    (reference sa_m4c.py:866-897)."""

    hidden_size: int = 768
    query_key_size: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_inputs, key_inputs, attention_mask):
        q = Dense(self.query_key_size, dtype=self.dtype, name="query")(query_inputs)
        k = Dense(self.query_key_size, dtype=self.dtype, name="key")(key_inputs)
        scores = jnp.einsum("btd,bkd->btk", q, k) / jnp.sqrt(
            self.query_key_size
        ).astype(self.dtype)
        bias = ((1.0 - attention_mask) * MASK_BIAS)[:, None, :]
        return scores + bias.astype(scores.dtype)


class MMT(nn.Module):
    """Joint-stream transformer (reference MMT, sa_m4c.py:773-863).

    ``attention_backend``: "xla" (explicit masks) or "pallas" (fused kernel
    rebuilding the spatial bias in VMEM; used when attention dropout is
    inactive, i.e. eval/decode or no-drop configs — numerics identical).
    """

    config: MMTConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        text_bert_emb,
        obj_mmt_in,
        ocr_mmt_in,
        fixed_ans_emb,
        prev_inds,
        question_mask,
        obj_mask,
        ocr_mask,
        spatial_classes,
        deterministic=True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dec_emb = PrevPredEmbeddings(
            hidden_size=cfg.hidden_size,
            hidden_dropout_prob=cfg.hidden_dropout_prob,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            name="prev_pred_embeddings",
        )(fixed_ans_emb, ocr_mmt_in, prev_inds, deterministic)

        x = jnp.concatenate([text_bert_emb, obj_mmt_in, ocr_mmt_in, dec_emb], axis=1)
        b, length, _ = x.shape
        dec_len = dec_emb.shape[1]

        # prefix-LM base mask: everything attends to unpadded encoder
        # positions; the decoder block is causal (reference :793-845).
        dec_zeros = jnp.zeros((b, dec_len), dtype=question_mask.dtype)
        col_mask = jnp.concatenate(
            [question_mask, obj_mask, ocr_mask, dec_zeros], axis=1
        )
        base_ok = jnp.broadcast_to(
            (col_mask > 0)[:, None, None, :], (b, 1, length, length)
        )
        causal = causal_mask(dec_len) > 0
        base_ok = base_ok.at[:, :, -dec_len:, -dec_len:].set(
            causal[None, None] | base_ok[:, :, -dec_len:, -dec_len:]
        )
        # base bias for normal layers
        base_bias = jnp.where(base_ok, 0.0, MASK_BIAS).astype(jnp.float32)

        # pallas is deterministic-only: with dropout active the XLA path is
        # faster on v5e (the fused train kernel was measured 5% slower and
        # removed, see ops/fused_attention.py), so training silently uses xla
        use_pallas = self.attention_backend == "pallas" and deterministic

        # dropout mask reuse (config.dropout_mask_reuse): every layer gets
        # the SAME per-site-type dropout RNG, so the bernoulli draws are
        # identical HLO and XLA CSEs 6 layers' worth of RNG work into one
        # draw per site type. Masks remain independent across site types,
        # steps, and examples.
        shared_rngs = None
        if not deterministic and cfg.dropout_mask_reuse:
            base = self.make_rng("dropout")
            shared_rngs = {
                name: jax.random.fold_in(base, i)
                for i, name in enumerate(("attn", "self_out", "ffn_out"))
            }

        # no_drop zeroes ONLY the spatial/implicit layers' attention-probs
        # dropout (reference sa_m4c.py:434-436 — the override lives inside
        # SpatialBertSelfAttention; normal layers and all hidden dropouts
        # keep their configured rates)
        spatial_attn_drop = 0.0 if cfg.no_drop else cfg.attention_probs_dropout_prob

        # fused dropout draw (config.dropout_fused_draw, OPT-IN — measured
        # 26% slower end-to-end, SCALING.md "fused dropout draw"): batch
        # all MMT layers' dropout bit generation into a few LARGE bernoulli
        # calls — one per (rate, heads) group for the attention-probs sites
        # plus one for the 2-per-layer hidden sites — then hand each layer
        # its pre-drawn keep-mask page. Every element remains an independent
        # Bernoulli(1-p), exactly like per-site draws (reference dropout
        # semantics, sa_m4c.py:434-436 + BertSelfOutput/BertOutput); only
        # where the bits are generated changes (pre-drawn pages in HBM vs
        # threefry fused into each consumer — which is why this loses).
        fused_drops = None
        if (
            not deterministic
            and cfg.dropout_fused_draw
            and not cfg.dropout_mask_reuse
        ):
            n_layers = len(cfg.layer_type_list)
            fused_drops = [dict() for _ in range(n_layers)]
            base = self.make_rng("dropout")
            attn_groups: Dict[tuple, list] = {}
            for idx, layer_type in enumerate(cfg.layer_type_list):
                if layer_type == "n":
                    heads, rate = (
                        cfg.num_attention_heads,
                        cfg.attention_probs_dropout_prob,
                    )
                else:
                    heads = cfg.num_spatial_relations + (
                        cfg.num_implicit_relations if layer_type == "i" else 0
                    )
                    rate = spatial_attn_drop
                if rate > 0.0:
                    attn_groups.setdefault((rate, heads), []).append(idx)
            for gi, ((rate, heads), idxs) in enumerate(
                sorted(attn_groups.items())
            ):
                keep = jax.random.bernoulli(
                    jax.random.fold_in(base, gi),
                    1.0 - rate,
                    (len(idxs), b, heads, length, length),
                )
                for j, idx in enumerate(idxs):
                    fused_drops[idx]["attn"] = keep[j]
            if cfg.hidden_dropout_prob > 0.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(base, 255),
                    1.0 - cfg.hidden_dropout_prob,
                    (n_layers, 2, b, length, cfg.hidden_size),
                )
                for idx in range(n_layers):
                    fused_drops[idx]["self_out"] = keep[idx, 0]
                    fused_drops[idx]["ffn_out"] = keep[idx, 1]

        # combined boolean masks per spatial context key, built once
        # (skipped entirely on the pallas path — the kernel rebuilds the
        # bias in VMEM from the class matrix)
        num_implicit = (
            cfg.num_implicit_relations if "i" in cfg.layer_type_list else 0
        )
        combined: Dict[str, jnp.ndarray] = {}
        pallas_ctxs: Dict[str, dict] = {}
        n_ctx = spatial_classes.shape[-1]
        for layer_type, mix in zip(cfg.layer_type_list, cfg.mix_list):
            if layer_type not in ("s", "i"):
                continue
            key = MATRIX_TYPE_MAP[mix]
            cache_key = (key, layer_type)  # 'i' layers carry extra heads
            if cache_key in combined or cache_key in pallas_ctxs:
                continue
            if use_pallas and layer_type == "s":
                pallas_ctxs[cache_key] = {
                    "classes": spatial_classes,
                    "lut": jnp.asarray(
                        relation_head_lut(key), jnp.float32
                    ),
                    "col_mask": col_mask.astype(jnp.float32),
                    "q_len": cfg.max_seq_length,
                    "n_ctx": n_ctx,
                    "dec_len": dec_len,
                    "quadrants": tuple(cfg.attention_mask_quadrants),
                }
                continue
            allowed = build_spatial_allowed(
                spatial_classes,
                relation_head_lut(key),  # host constant, folded at trace
                question_len=cfg.max_seq_length,
                decode_len=dec_len,
                mask_quadrants=cfg.attention_mask_quadrants,
                num_spatial_heads=cfg.num_spatial_relations,
                num_implicit_heads=num_implicit if layer_type == "i" else 0,
            )
            combined[cache_key] = allowed & base_ok

        # interleave layers per layer_type_list (reference :738-752)
        n_i = s_i = i_i = 0
        for layer_idx, (layer_type, mix) in enumerate(
            zip(cfg.layer_type_list, cfg.mix_list)
        ):
            drop_masks = fused_drops[layer_idx] if fused_drops else None
            if layer_type == "n":
                x = BertLayer(
                    hidden_size=cfg.hidden_size,
                    num_heads=cfg.num_attention_heads,
                    intermediate_size=cfg.intermediate_size,
                    hidden_dropout_prob=cfg.hidden_dropout_prob,
                    attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
                    layer_norm_eps=cfg.layer_norm_eps,
                    dtype=self.dtype,
                    name=f"normal_layer_{n_i}",
                )(x, base_bias, deterministic, shared_rngs=shared_rngs,
                  drop_masks=drop_masks)
                n_i += 1
            elif layer_type == "s":
                cache_key = (MATRIX_TYPE_MAP[mix], "s")
                x = SpatialBertLayer(
                    hidden_size=cfg.hidden_size,
                    num_heads=cfg.num_spatial_relations,
                    intermediate_size=cfg.intermediate_size,
                    hidden_dropout_prob=cfg.hidden_dropout_prob,
                    attention_probs_dropout_prob=spatial_attn_drop,
                    layer_norm_eps=cfg.layer_norm_eps,
                    use_head_bias=cfg.use_bias,
                    dtype=self.dtype,
                    name=f"spatial_layer_{s_i}",
                )(
                    x,
                    combined.get(cache_key),
                    deterministic,
                    pallas_ctx=pallas_ctxs.get(cache_key),
                    shared_rngs=shared_rngs,
                    drop_masks=drop_masks,
                )
                s_i += 1
            elif layer_type == "i":
                x = SpatialBertLayer(
                    hidden_size=cfg.hidden_size,
                    num_heads=cfg.num_spatial_relations + cfg.num_implicit_relations,
                    intermediate_size=cfg.intermediate_size,
                    hidden_dropout_prob=cfg.hidden_dropout_prob,
                    attention_probs_dropout_prob=spatial_attn_drop,
                    layer_norm_eps=cfg.layer_norm_eps,
                    use_head_bias=cfg.use_bias,
                    dtype=self.dtype,
                    name=f"implicit_layer_{i_i}",
                )(x, combined[(MATRIX_TYPE_MAP[mix], "i")], deterministic,
                  shared_rngs=shared_rngs, drop_masks=drop_masks)
                i_i += 1
            else:
                raise ValueError(layer_type)

        txt_len = cfg.max_seq_length
        ocr_begin = txt_len + cfg.max_obj_num
        ocr_end = ocr_begin + cfg.max_ocr_num
        return {
            "mmt_seq_output": x,
            "mmt_txt_output": x[:, :txt_len],
            "mmt_ocr_output": x[:, ocr_begin:ocr_end],
            "mmt_dec_output": x[:, -dec_len:],
        }
