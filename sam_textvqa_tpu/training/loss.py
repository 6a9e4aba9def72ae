"""Training loss.

Reference: M4CDecodingBCEWithMaskLoss (sam/task_utils.py:19-30) — per-element
binary cross entropy with logits, masked per decoding step, summed and
divided by the (clamped) number of unmasked steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def m4c_decoding_bce_sum(
    scores: jnp.ndarray, targets: jnp.ndarray, loss_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized masked BCE: ``(sum of per-element losses, RAW unmasked
    count)``. The linear-in-rows form gradient accumulation needs —
    microbatch sums (and their grads) add, and one clamped division by the
    GLOBAL count at the end reproduces the reference's full-batch
    normalization exactly (sam/task_utils.py:19-30 divides by the whole
    batch's unmasked-step count, not per-row). The count is returned
    unclamped so partial sums stay additive; clamp at the point of
    division."""
    assert scores.ndim == 3 and loss_mask.ndim == 2
    scores = scores.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # stable BCE-with-logits: max(x,0) - x*t + log1p(exp(-|x|))
    losses = (
        jnp.maximum(scores, 0.0)
        - scores * targets
        + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    losses = losses * loss_mask[..., None]
    return jnp.sum(losses), jnp.sum(loss_mask)


def m4c_decoding_bce_with_mask(
    scores: jnp.ndarray, targets: jnp.ndarray, loss_mask: jnp.ndarray
) -> jnp.ndarray:
    """BCE-with-logits masked over decoding steps.

    Args:
      scores: (B, T, V) logits.
      targets: (B, T, V) soft targets in [0, 1].
      loss_mask: (B, T) 1.0 on supervised steps.
    """
    total, count = m4c_decoding_bce_sum(scores, targets, loss_mask)
    return total / jnp.maximum(count, 1.0)
