"""BERT building blocks in flax, matching pytorch_transformers==1.0.0
numerics (the blocks the reference composes: BertEmbeddings / BertLayer /
BertEncoder used by TextBert and the MMT's "normal" layers; reference
sam/sa_m4c.py:374-396 and the pytorch_transformers imports at :8-10).

Parameter names/layout mirror the torch ``state_dict`` (``weight`` stored
(out, in)) so checkpoint conversion is a pure name-mapping.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Dense,
    LayerNormTF,
    apply_keep_mask,
    gelu_erf,
    masked_softmax_attention,
)


class BertEmbeddings(nn.Module):
    """Token + position + type embeddings -> LayerNorm -> dropout."""

    vocab_size: int
    hidden_size: int = 768
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        b, l = input_ids.shape
        word = self.param(
            "word_embeddings",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.hidden_size),
            jnp.float32,
        )
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.max_position_embeddings, self.hidden_size),
            jnp.float32,
        )
        typ = self.param(
            "token_type_embeddings",
            nn.initializers.normal(0.02),
            (self.type_vocab_size, self.hidden_size),
            jnp.float32,
        )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (
            jnp.take(word, input_ids, axis=0)
            + pos[None, :l]
            + jnp.take(typ, token_type_ids, axis=0)
        ).astype(self.dtype)
        x = LayerNormTF(epsilon=self.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(rate=self.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    """Multi-head self-attention with additive (B,1|H,L,L) bias."""

    hidden_size: int = 768
    num_heads: int = 12
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True, shared_rngs=None,
                 attn_keep=None):
        b, l, d = x.shape
        h = self.num_heads
        hd = self.hidden_size // h

        def split(t):  # (B, L, D) -> (B, H, L, hd)
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        q = split(Dense(self.hidden_size, dtype=self.dtype, name="query")(x))
        k = split(Dense(self.hidden_size, dtype=self.dtype, name="key")(x))
        v = split(Dense(self.hidden_size, dtype=self.dtype, name="value")(x))

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(
            self.dtype
        )
        shared = (shared_rngs or {}).get("attn")
        probs = masked_softmax_attention(
            scores,
            bias,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dropout_rng=shared,
            module=None if shared is not None else self,
            keep_mask=attn_keep,
        )
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return ctx.transpose(0, 2, 1, 3).reshape(b, l, d)


class BertSelfOutput(nn.Module):
    hidden_size: int = 768
    hidden_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True, rng=None,
                 keep_mask=None):
        hidden = Dense(self.hidden_size, dtype=self.dtype, name="dense")(hidden)
        if keep_mask is not None and not deterministic and self.hidden_dropout_prob > 0:
            hidden = apply_keep_mask(hidden, keep_mask, self.hidden_dropout_prob)
        else:
            hidden = nn.Dropout(rate=self.hidden_dropout_prob)(
                hidden, deterministic=deterministic, rng=rng
            )
        return LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="LayerNorm"
        )(hidden + residual)


class BertLayer(nn.Module):
    """attention -> intermediate (dense+gelu) -> output (dense+res+LN)."""

    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True, shared_rngs=None,
                 drop_masks=None):
        shared_rngs = shared_rngs or {}
        drop_masks = drop_masks or {}
        attn = BertSelfAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout_rate=self.attention_probs_dropout_prob,
            dtype=self.dtype,
            name="attention_self",
        )(x, bias, deterministic, shared_rngs=shared_rngs,
          attn_keep=drop_masks.get("attn"))
        attn_out = BertSelfOutput(
            hidden_size=self.hidden_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            name="attention_output",
        )(attn, x, deterministic, rng=shared_rngs.get("self_out"),
          keep_mask=drop_masks.get("self_out"))
        inter = gelu_erf(
            Dense(self.intermediate_size, dtype=self.dtype, name="intermediate_dense")(
                attn_out
            )
        )
        out = Dense(self.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        ffn_keep = drop_masks.get("ffn_out")
        if ffn_keep is not None and not deterministic and self.hidden_dropout_prob > 0:
            out = apply_keep_mask(out, ffn_keep, self.hidden_dropout_prob)
        else:
            out = nn.Dropout(rate=self.hidden_dropout_prob)(
                out, deterministic=deterministic, rng=shared_rngs.get("ffn_out")
            )
        return LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="output_LayerNorm"
        )(out + attn_out)


class TextBert(nn.Module):
    """3-layer BERT encoder over the question (reference sa_m4c.py:374-396).

    Initialized from bert-base-uncased in the reference; here either randomly
    or from a converted checkpoint.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 3
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, question_indices, question_mask, deterministic=True):
        x = BertEmbeddings(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            name="embeddings",
        )(question_indices, deterministic=deterministic)
        # (1 - m) * -10000, broadcast over heads and query positions
        # (reference sa_m4c.py:386-387)
        bias = ((1.0 - question_mask) * -10000.0)[:, None, None, :]
        for i in range(self.num_hidden_layers):
            x = BertLayer(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                hidden_dropout_prob=self.hidden_dropout_prob,
                attention_probs_dropout_prob=self.attention_probs_dropout_prob,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, bias, deterministic)
        return x
