"""Image-region feature encoders.

Reference: sam/textvqa_encoders.py — ``ImageEncoder("default")`` is an
Identity over precomputed Faster-R-CNN fc7 features (:17-33, the only type
any shipped config uses), and ``FinetuneFasterRcnnFpnFc7`` is a
Linear+ReLU initialized from pickled detectron fc7 weights (:36-60).
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dense


class ImageEncoder(nn.Module):
    """``default`` -> identity; ``finetune_faster_rcnn_fpn_fc7`` -> a
    trainable Linear+ReLU (optionally initialized from detectron weights
    via :func:`load_detectron_fc7_weights` + param surgery)."""

    encoder_type: str = "default"
    out_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.encoder_type == "default":
            return x
        if self.encoder_type == "finetune_faster_rcnn_fpn_fc7":
            return nn.relu(Dense(self.out_dim, dtype=self.dtype, name="lc")(x))
        raise NotImplementedError(f"Unknown image encoder {self.encoder_type}")


def load_detectron_fc7_weights(
    weights_file: str, bias_file: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Pickled detectron fc7 (weight, bias) arrays; weight is (out, in) —
    the same layout our Dense stores (reference textvqa_encoders.py:46-54)."""
    with open(weights_file, "rb") as w:
        weights = pickle.load(w)
    with open(bias_file, "rb") as b:
        bias = pickle.load(b)
    return np.asarray(weights, np.float32), np.asarray(bias, np.float32)
