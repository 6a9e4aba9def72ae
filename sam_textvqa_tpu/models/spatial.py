"""Spatially-masked self-attention — the paper's core op.

The reference builds, per spatial layer and per forward, a float
(B, L, L, 12) mask from precomputed one-hot adjacency tensors, permutes it,
and combines with the padding/causal mask via ``torch.min``
(reference sam/sa_m4c.py:399-610). Here:

* masks are **boolean** end to end (the -10000 additive bias is materialized
  only inside the softmax where XLA fuses it);
* the per-head adjacency comes from the int8 relation-class matrix via the
  (13, 12) LUT (see ops/spatial_graph.py) — no one-hot tensors are shipped
  or stored;
* the combined mask is built ONCE per context key per forward and shared by
  all spatial layers that consume that key (the reference rebuilds it in
  every layer).

Semantics preserved exactly:
* quadrant masking of the question/dec rows & cols for spatial heads only
  (reference :504-549, quadrant grid documented in the config YAML);
* optional implicit (unmasked) extra heads (reference :487-495);
* ``min`` combination with the prefix-LM mask == boolean AND (:568);
* rows with every key masked get their attention probabilities zeroed
  (``entity_probs_mask``, :574-584).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense, MASK_BIAS, masked_softmax_attention


def build_spatial_allowed(
    classes: jnp.ndarray,
    lut: jnp.ndarray,
    question_len: int,
    decode_len: int,
    mask_quadrants: Sequence[int],
    num_spatial_heads: int,
    num_implicit_heads: int = 0,
) -> jnp.ndarray:
    """Boolean per-head spatial attention permission, (B, H, L, L).

    Args:
      classes: (B, N, N) int relation classes over the obj+ocr block.
      lut: (13, num_spatial_heads) bool relation->head LUT for the layer's
        context key.
      question_len / decode_len: lengths of the question prefix and decoder
        suffix flanking the obj+ocr block in the joint stream.
      mask_quadrants: which quadrants of the (L, L) grid to zero for the
        spatial heads (reference config ``attention_mask_quadrants``).
      num_implicit_heads: extra always-on heads appended after the spatial
        ones (reference sa_m4c.py:487-495).
    """
    b, n, _ = classes.shape
    length = question_len + n + decode_len
    hs = num_spatial_heads

    allowed = jnp.ones((b, hs, length, length), dtype=bool)
    # obj+ocr block: relation LUT gather -> (B, N, N, hs) -> (B, hs, N, N)
    block = jnp.take(lut.astype(bool), classes.astype(jnp.int32), axis=0)
    block = jnp.transpose(block, (0, 3, 1, 2))
    q0, q1 = question_len, question_len + n
    allowed = allowed.at[:, :, q0:q1, q0:q1].set(block)

    # quadrant masking (reference sa_m4c.py:504-549); quadrants 3/6 (x -> dec
    # columns) are never masked there either.
    spans = {  # quadrant id -> (row span, col span)
        1: ((0, q0), (0, q0)),
        2: ((0, q0), (q0, q1)),
        4: ((q0, q1), (0, q0)),
        7: ((q1, length), (0, q0)),
        8: ((q1, length), (q0, q1)),
        9: ((q1, length), (q1, length)),
    }
    for quadrant in mask_quadrants:
        (r0, r1), (c0, c1) = spans[quadrant]
        allowed = allowed.at[:, :, r0:r1, c0:c1].set(False)

    if num_implicit_heads:
        implicit = jnp.ones((b, num_implicit_heads, length, length), dtype=bool)
        allowed = jnp.concatenate([allowed, implicit], axis=1)
    return allowed


class SpatialBertSelfAttention(nn.Module):
    """Self-attention whose heads are gated by the spatial permission mask
    (reference SpatialBertSelfAttention, sa_m4c.py:399-610).

    Two compute paths with identical numerics:
      * ``xla`` — explicit combined boolean mask + fused-by-XLA softmax;
      * ``pallas`` — ops/fused_attention.py kernel that rebuilds the bias
        in VMEM from the int8 class matrix (no (B,H,L,L) mask in HBM).
    The pallas path is used when a ``pallas_ctx`` is supplied and attention
    dropout is off (eval / decode, or no_drop configs).
    """

    hidden_size: int = 768
    num_heads: int = 12  # spatial + implicit
    dropout_rate: float = 0.1
    use_head_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, combined_ok, deterministic=True, pallas_ctx=None):
        b, l, d = x.shape
        h = self.num_heads
        hd = self.hidden_size // h

        def split(t):
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        q = split(Dense(self.hidden_size, dtype=self.dtype, name="query")(x))
        k = split(Dense(self.hidden_size, dtype=self.dtype, name="key")(x))
        v = split(Dense(self.hidden_size, dtype=self.dtype, name="value")(x))

        # pallas kernels only compile for TPU; CPU (tests, virtual meshes)
        # runs them interpreted
        interpret = jax.default_backend() == "cpu"
        if pallas_ctx is not None and deterministic:
            from ..ops.fused_attention import spatial_attention_fwd

            ctx = spatial_attention_fwd(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                v.astype(jnp.float32),
                pallas_ctx["classes"],
                pallas_ctx["lut"],
                pallas_ctx["col_mask"],
                q_len=pallas_ctx["q_len"],
                n_ctx=pallas_ctx["n_ctx"],
                dec_len=pallas_ctx["dec_len"],
                mask_quadrants=pallas_ctx["quadrants"],
                interpret=interpret,
            ).astype(self.dtype)
        elif pallas_ctx is not None:
            # training: fused fwd+bwd kernel with in-kernel dropout
            # (deterministic per (seed, batch, head); see ops/fused_attention)
            from ..ops.fused_attention import make_spatial_attention_train

            attn_fn = make_spatial_attention_train(
                q_len=pallas_ctx["q_len"],
                n_ctx=pallas_ctx["n_ctx"],
                dec_len=pallas_ctx["dec_len"],
                mask_quadrants=pallas_ctx["quadrants"],
                dropout_rate=self.dropout_rate,
                interpret=interpret,
            )
            if self.dropout_rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = jnp.int32(0)
            ctx = attn_fn(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                v.astype(jnp.float32),
                pallas_ctx["classes"],
                pallas_ctx["lut"],
                pallas_ctx["col_mask"],
                seed,
            ).astype(self.dtype)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(
                self.dtype
            )
            bias = jnp.where(combined_ok, 0.0, MASK_BIAS).astype(jnp.float32)
            probs = masked_softmax_attention(
                scores,
                bias,
                zero_fully_masked=True,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                module=self,
            )
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        if self.use_head_bias:
            # learned output bias shared across positions (reference :439-443,
            # :600-603 adds biases(0) — an Embedding(1, hidden) lookup)
            head_bias = self.param(
                "biases", nn.initializers.normal(0.02), (1, d), jnp.float32
            )
            ctx = ctx + head_bias.astype(ctx.dtype)
        return ctx


class SpatialBertLayer(nn.Module):
    """Spatial attention + the standard BERT FFN block
    (reference SpatialBertLayer, sa_m4c.py:660-684)."""

    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    use_head_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, combined_ok, deterministic=True, pallas_ctx=None):
        from .bert import BertSelfOutput
        from .layers import LayerNormTF, gelu_erf

        attn = SpatialBertSelfAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout_rate=self.attention_probs_dropout_prob,
            use_head_bias=self.use_head_bias,
            dtype=self.dtype,
            name="attention_self",
        )(x, combined_ok, deterministic, pallas_ctx=pallas_ctx)
        attn_out = BertSelfOutput(
            hidden_size=self.hidden_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            name="attention_output",
        )(attn, x, deterministic)
        inter = gelu_erf(
            Dense(self.intermediate_size, dtype=self.dtype, name="intermediate_dense")(
                attn_out
            )
        )
        out = Dense(self.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        out = nn.Dropout(rate=self.hidden_dropout_prob)(
            out, deterministic=deterministic
        )
        return LayerNormTF(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="output_LayerNorm"
        )(out + attn_out)
