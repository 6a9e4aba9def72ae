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


def apply_detectron_fc7_weights(
    params,
    weights_file: str,
    bias_file: str,
    modules: Tuple[str, ...] = ("obj_faster_rcnn_fc7", "ocr_faster_rcnn_fc7"),
):
    """Install pickled detectron fc7 weights into the frcn encoder params.

    The reference does this inside ``FinetuneFasterRcnnFpnFc7.__init__``
    (textvqa_encoders.py:46-57) at construction; here params are explicit,
    so the surgery happens after ``model.init``. Returns (new_params,
    installed_module_names). Modules absent from the tree (encoder_type
    "default" has no params) are skipped.
    """
    weights, bias = load_detectron_fc7_weights(weights_file, bias_file)
    new_params = dict(params)
    installed = []
    for mod in modules:
        sub = new_params.get(mod)
        if not sub or "lc" not in sub:
            continue
        lc = dict(sub["lc"])
        assert lc["weight"].shape == weights.shape, (
            mod, lc["weight"].shape, weights.shape)
        assert lc["bias"].shape == bias.shape, (mod, lc["bias"].shape, bias.shape)
        lc["weight"] = jnp.asarray(weights)
        lc["bias"] = jnp.asarray(bias)
        new_params[mod] = {**dict(sub), "lc": lc}
        installed.append(mod)
    return new_params, installed
