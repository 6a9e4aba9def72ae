"""Shared model layers.

Numeric semantics mirror the reference exactly where parity matters:

* :class:`LayerNormTF` — TF-style layer norm with epsilon inside the square
  root (the reference's BertLayerNorm fallback, sam/sa_m4c.py:1016-1028).
* :func:`gelu_erf` — the erf-based GeLU used by pytorch_transformers BERT
  (reference sam/sa_m4c.py:985-991).
* :func:`masked_softmax_attention` — softmax over additive-bias scores with
  the reference's fully-masked-row zeroing (sam/sa_m4c.py:574-584).
* :func:`l2_normalize` — torch ``F.normalize(dim=-1)`` semantics
  (denominator clamped at 1e-12; reference sam/sa_m4c.py:209-238).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

MASK_BIAS = -10000.0


def row_alive_from_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Fully-masked-row indicator (reference entity_probs_mask,
    sam/sa_m4c.py:574-584) in a dtype-robust form: a row is alive if any
    key's additive bias sits above ``MASK_BIAS / 2``. Exact arithmetic
    against -10000 would misclassify a bf16 bias (bf16 rounds -10000 to
    -9984, leaking 0.0016 into dead rows); the threshold compare is exact
    for every bias dtype. Single home of the idiom — used by the module
    attention path and all fast_decode variants."""
    return jnp.max(bias, axis=-1, keepdims=True) > (MASK_BIAS / 2)


def apply_keep_mask(x: jnp.ndarray, keep: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout with a PRE-DRAWN boolean keep mask — the same math
    as ``nn.Dropout`` / the explicit bernoulli path (``where(keep,
    x/(1-rate), 0)``), but with bit generation hoisted out so the MMT can
    batch all layers' draws into a few large bernoulli calls
    (MMTConfig.dropout_fused_draw; tools/bench_dropout_draw.py)."""
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype), 0.0)


def gelu_erf(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def l2_normalize(x, eps: float = 1e-12):
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


class LayerNormTF(nn.Module):
    """LayerNorm with eps inside the sqrt, computed in fp32 for stability."""

    epsilon: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.square(xf - u).mean(-1, keepdims=True)
        y = (xf - u) / jnp.sqrt(s + self.epsilon)
        return (weight * y + bias).astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with torch-compatible parameter naming/layout.

    Stores ``weight`` as (out, in) like torch so converted checkpoints map
    1:1; the matmul transposes at trace time (XLA folds it into the layout).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight", self.kernel_init, (self.features, in_dim), jnp.float32
        )
        y = jnp.matmul(x, weight.T.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def masked_softmax_attention(
    scores: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    zero_fully_masked: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    module: Optional[nn.Module] = None,
    keep_mask: Optional[jnp.ndarray] = None,
):
    """softmax(scores + bias) with optional fully-masked-row zeroing.

    ``bias`` uses the reference's 0 / -10000 additive convention. When
    ``zero_fully_masked`` (spatial layers), rows whose every key carries the
    -10000 bias get their probabilities zeroed exactly like the reference's
    ``entity_probs_mask`` (sam/sa_m4c.py:574-584).
    """
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
    if zero_fully_masked:
        probs = probs * row_alive_from_bias(bias).astype(probs.dtype)
    if dropout_rate > 0.0 and not deterministic:
        if keep_mask is not None:
            probs = apply_keep_mask(probs, keep_mask, dropout_rate)
        elif module is not None:
            probs = nn.Dropout(rate=dropout_rate)(probs, deterministic=False)
        else:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return probs


def extend_attention_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) {0,1} -> (B, 1, 1, L) additive bias (0 keep / -10000 drop)."""
    return ((1.0 - mask) * MASK_BIAS)[:, None, None, :]


def causal_mask(length: int) -> jnp.ndarray:
    """(L, L) lower-triangular ones (reference _get_causal_mask,
    sam/sa_m4c.py:960-967)."""
    return jnp.tril(jnp.ones((length, length), dtype=jnp.float32))
