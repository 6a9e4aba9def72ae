"""Optimizer: Adam with warmup + stepwise decay and per-module LR scaling.

Reference semantics reproduced exactly:
* Adam(lr=base) with torch defaults b1=0.9, b2=0.999, eps=1e-8
  (sam/task_utils.py:42);
* LambdaLR factor — linear warmup from ``warmup_factor`` to 1.0 over
  ``warmup_iters`` (inclusive), then ``lr_decay ** bisect(lr_decay_iters, t)``
  (sam/task_utils.py:48-56);
* per-module LR scales from ``SAM4C.get_optimizer_parameters``
  (sam/sa_m4c.py:349-371): TextBERT at ``lr_scale_text_bert`` (0.1), MMT at
  ``lr_scale_mmt`` (1.0), everything else at 1.0;
* global-norm gradient clip at ``max_grad_norm`` applied before the update
  (sam/task_utils.py:33-34, train.py:139).

Implemented as one optax chain: clip -> scale_by_adam -> per-leaf lr scale ->
schedule * -base_lr. (LR placement after Adam's normalization matches torch's
per-group learning rates.)
"""

from __future__ import annotations

from bisect import bisect
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import TaskConfig


def lr_factor_schedule(task_cfg: TaskConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The LambdaLR multiplier as a jax-traceable function of the step."""
    warmup_iters = task_cfg.warmup_iters
    warmup_factor = task_cfg.warmup_factor
    decay_iters = jnp.asarray(task_cfg.lr_decay_iters)
    lr_decay = task_cfg.lr_decay

    def factor(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        alpha = step / float(warmup_iters)
        warm = warmup_factor * (1.0 - alpha) + alpha
        # bisect(list, t) == number of decay milestones <= t
        idx = jnp.sum((decay_iters <= step).astype(jnp.float32))
        decayed = jnp.power(lr_decay, idx)
        return jnp.where(step <= warmup_iters, warm, decayed)

    return factor


def param_lr_scales(params, task_cfg: TaskConfig):
    """Per-leaf LR multipliers mirroring the reference param groups.

    The text_bert scale applies ONLY when initializing from bert-base: the
    reference registers the text_bert finetune group inside the
    ``text_bert_init_from_bert_base`` branch (sam/sa_m4c.py:74-88) — a
    randomly-initialized TextBert trains at the base LR.  (Verified by the
    torch-vs-optax trajectory oracle,
    tests/test_reference_model_oracle.py::test_optimizer_trajectory_*.)
    """
    tb_scale = (
        task_cfg.text_bert.lr_scale_text_bert
        if task_cfg.text_bert.text_bert_init_from_bert_base
        else 1.0
    )
    mmt_scale = task_cfg.mmt.lr_scale_mmt

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def scale_for(path) -> float:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "text_bert":
            return tb_scale
        if top == "mmt":
            return mmt_scale
        return 1.0

    scales = {jax.tree_util.keystr(p): scale_for(p) for p, _ in flat}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [scale_for(p) for p, _ in flat],
    ), scales


def _scale_by_tree(scale_tree) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree.map(lambda u, s: u * s, updates, scale_tree),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params, task_cfg: TaskConfig
) -> optax.GradientTransformation:
    base_lr = task_cfg.lr
    factor = lr_factor_schedule(task_cfg)
    scale_tree, _ = param_lr_scales(params, task_cfg)
    return optax.chain(
        optax.clip_by_global_norm(task_cfg.max_grad_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        _scale_by_tree(scale_tree),
        optax.scale_by_schedule(lambda step: -base_lr * factor(step)),
    )
