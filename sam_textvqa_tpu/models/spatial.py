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
import numpy as np
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
    h_total = hs + num_implicit_heads

    # TPU-friendly construction: no gathers, no dynamic-update-slices (both
    # profiled slow — ~5 ms/step at batch 64). The LUT collapses to one
    # int32 bitmask per relation class; positions outside the obj+ocr block
    # get a sentinel class whose bitmask allows every head. Everything below
    # is fused elementwise work over (B, L, L).
    # ``lut`` must be a HOST array (np.ndarray) — it is folded into python
    # ints at trace time.
    if not isinstance(lut, np.ndarray):
        lut = np.asarray(lut)  # raises on traced inputs, by design
    lut = lut.astype(bool)
    implicit_bits = ((1 << h_total) - 1) ^ ((1 << hs) - 1)
    class_bits = [
        int(sum((1 << h) for h in range(hs) if lut[c, h])) | implicit_bits
        for c in range(13)
    ]
    sentinel_bits = (1 << h_total) - 1  # outside the ctx block: all heads

    frame = jnp.pad(
        classes.astype(jnp.int32),
        ((0, 0), (question_len, decode_len), (question_len, decode_len)),
        constant_values=13,
    )
    bits = jnp.full(frame.shape, class_bits[0], dtype=jnp.int32)
    for c in range(1, 13):
        bits = jnp.where(frame == c, class_bits[c], bits)
    bits = jnp.where(frame == 13, sentinel_bits, bits)

    heads = jnp.arange(h_total, dtype=jnp.int32)[None, :, None, None]
    allowed = ((bits[:, None, :, :] >> heads) & 1) > 0  # (B, H, L, L)

    # quadrant masking for the spatial heads only (reference
    # sa_m4c.py:504-549); quadrants 3/6 (x -> dec columns) are never masked
    # there either.
    if mask_quadrants:
        rows = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
        q0, q1 = question_len, question_len + n
        spans = {  # quadrant id -> (row predicate, col predicate)
            1: (rows < q0) & (cols < q0),
            2: (rows < q0) & (cols >= q0) & (cols < q1),
            4: (rows >= q0) & (rows < q1) & (cols < q0),
            7: (rows >= q1) & (cols < q0),
            8: (rows >= q1) & (cols >= q0) & (cols < q1),
            9: (rows >= q1) & (cols >= q1),
        }
        masked = jnp.zeros((length, length), dtype=bool)
        for quadrant in mask_quadrants:
            masked = masked | spans[quadrant]
        spatial_head = (heads < hs)[0, :, 0, 0][None, :, None, None]
        allowed = allowed & ~(masked[None, None] & spatial_head)
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
    def __call__(self, x, combined_ok, deterministic=True, pallas_ctx=None,
                 shared_rngs=None, attn_keep=None):
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
        if pallas_ctx is not None:
            # deterministic only: MMT supplies a pallas_ctx exclusively for
            # eval/decode passes (the fused train variant measured 5% slower
            # than XLA on v5e and was removed; see ops/fused_attention.py)
            assert deterministic, "pallas path is deterministic-only"
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
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(
                self.dtype
            )
            bias = jnp.where(combined_ok, 0.0, MASK_BIAS).astype(jnp.float32)
            shared = (shared_rngs or {}).get("attn")
            probs = masked_softmax_attention(
                scores,
                bias,
                zero_fully_masked=True,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                dropout_rng=shared,
                module=None if shared is not None else self,
                keep_mask=attn_keep,
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
    def __call__(self, x, combined_ok, deterministic=True, pallas_ctx=None,
                 shared_rngs=None, drop_masks=None):
        from .bert import BertSelfOutput
        from .layers import LayerNormTF, apply_keep_mask, gelu_erf

        shared_rngs = shared_rngs or {}
        drop_masks = drop_masks or {}
        attn = SpatialBertSelfAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout_rate=self.attention_probs_dropout_prob,
            use_head_bias=self.use_head_bias,
            dtype=self.dtype,
            name="attention_self",
        )(x, combined_ok, deterministic, pallas_ctx=pallas_ctx,
          shared_rngs=shared_rngs, attn_keep=drop_masks.get("attn"))
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
