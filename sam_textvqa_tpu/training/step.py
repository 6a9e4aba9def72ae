"""Jitted training / evaluation steps over a device mesh.

Replaces the reference's forward_model + backward + clip + step sequence
(reference sam/task_utils.py:99-135, train.py:133-144) with one fused,
jit-compiled step. Under a mesh with the batch sharded on ``data``, XLA
emits the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .loss import m4c_decoding_bce_with_mask


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(model, optimizer):
    """Returns train_step(state, batch, base_rng) -> (state, metrics).

    metrics carries the scalar loss and the per-step argmax prediction ids
    (host-side accuracy decoding needs only the ids, not the full
    (B, T, V+O) score tensor — the reference round-trips scores to CPU every
    step, metrics.py:26-28).
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], base_rng):
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            loss = m4c_decoding_bce_with_mask(
                out["scores"], batch["targets"], batch["train_loss_mask"]
            )
            return loss, out["scores"]

        (loss, scores), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = {
            "loss": loss,
            "pred_ids": jnp.argmax(scores, axis=-1).astype(jnp.int32),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model):
    """Teacher-forced eval forward (loss + ids), deterministic."""

    def eval_step(params, batch):
        out = model.apply({"params": params}, batch, deterministic=True)
        loss = m4c_decoding_bce_with_mask(
            out["scores"], batch["targets"], batch["train_loss_mask"]
        )
        return {
            "loss": loss,
            "pred_ids": jnp.argmax(out["scores"], axis=-1).astype(jnp.int32),
        }

    return eval_step
