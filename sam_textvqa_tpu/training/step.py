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

from .loss import m4c_decoding_bce_sum, m4c_decoding_bce_with_mask


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


def make_train_step(model, optimizer, grad_accum: int = 1):
    """Returns train_step(state, batch, base_rng) -> (state, metrics).

    metrics carries the scalar loss and the per-step argmax prediction ids
    (host-side accuracy decoding needs only the ids, not the full
    (B, T, V+O) score tensor — the reference round-trips scores to CPU every
    step, metrics.py:26-28).

    ``grad_accum=N`` (N > 1) runs the SAME global batch as N sequential
    microbatches under a ``lax.scan``, accumulating unnormalized loss/grad
    sums and applying ONE optimizer update — peak activation memory drops
    ~N× while the update matches the full-batch step exactly up to float
    reassociation (the loss normalizer is the GLOBAL unmasked-step count,
    so microbatch sums divide by the same denominator the reference's
    full-batch loss uses, sam/task_utils.py:19-30; global-norm clipping
    then acts on the already-averaged gradient, same as clipping the
    full-batch gradient). Microbatch i takes rows ``i::N`` — a strided
    split so each microbatch stays evenly sharded across a ``data`` mesh
    axis (a contiguous split would idle all but one device per microstep).
    With dropout active each microbatch draws from a distinct fold of the
    step's key, so masks differ from the one full-batch draw — identical
    distribution, different stream (exact equivalence is tested at
    dropout 0). Requires batch % N == 0 (and microbatch % dp for sharded
    runs).
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

    def train_step_accum(
        state: TrainState, batch: Dict[str, jnp.ndarray], base_rng
    ):
        n = grad_accum
        step_rng = jax.random.fold_in(base_rng, state.step)
        batch_size = batch["targets"].shape[0]
        if batch_size % n:
            raise ValueError(f"batch {batch_size} not divisible by accum {n}")

        def split(x):
            # (B, ...) -> (N, B//N, ...); microbatch i holds rows i::N so a
            # batch row-sharded over `data` keeps every device busy each
            # microstep
            return jnp.swapaxes(
                x.reshape((batch_size // n, n) + x.shape[1:]), 0, 1
            )

        micro = jax.tree.map(split, batch)
        params = state.params

        def sum_loss_fn(p, mb, rng):
            out = model.apply(
                {"params": p}, mb, deterministic=False, rngs={"dropout": rng}
            )
            total, count = m4c_decoding_bce_sum(
                out["scores"], mb["targets"], mb["train_loss_mask"]
            )
            return total, (count, jnp.argmax(out["scores"], -1).astype(jnp.int32))

        def body(carry, idx_mb):
            idx, mb = idx_mb
            gsum, lsum, csum = carry
            (total, (count, ids)), g = jax.value_and_grad(
                sum_loss_fn, has_aux=True
            )(params, mb, jax.random.fold_in(step_rng, idx))
            carry = (
                jax.tree.map(jnp.add, gsum, g),
                lsum + total,
                csum + count,
            )
            return carry, ids

        init = (
            jax.tree.map(jnp.zeros_like, params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        (gsum, lsum, csum), ids = jax.lax.scan(
            body, init, (jnp.arange(n), micro)
        )
        denom = jnp.maximum(csum, 1.0)
        grads = jax.tree.map(lambda g: g / denom, gsum)
        loss = lsum / denom
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # invert the strided split: (N, B//N, T) -> original row order
        pred_ids = jnp.swapaxes(ids, 0, 1).reshape(
            (batch_size,) + ids.shape[2:]
        )
        return (
            TrainState(state.step + 1, new_params, opt_state),
            {"loss": loss, "pred_ids": pred_ids},
        )

    return train_step if grad_accum == 1 else train_step_accum


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
