"""Training driver: epoch loop, per-epoch validation, best-checkpoint save,
resume.

Reference: the train loop in train.py:122-192 (epoch/iter loops, loss/acc
window logging every 20 steps, LR logging every 100, per-epoch greedy val,
best-val checkpoint). Differences by design:
* one jitted step (grads + clip + Adam + schedule) instead of 4 framework
  calls;
* async dispatch — host metrics are fetched with a 1-step delay so the TPU
  never waits on Python;
* true resume (reference hard-codes start step 0, train.py:104).
"""

from __future__ import annotations

import logging
import os
import signal
import threading
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaskConfig
from ..data.dataset import EpochBatcher
from ..evaluation.evaluator import Evaluator
from ..training.optimizer import make_optimizer
from ..training.step import TrainState, create_train_state, make_train_step
from ..utils.checkpoint import restore_checkpoint, save_checkpoint

logger = logging.getLogger(__name__)


def _device_view(batch: Dict) -> Dict:
    # train_acc_mask rides in the batch for content parity with the
    # reference's batch dict but nothing on device consumes it (see
    # _batch_accuracy) — keep it host-side
    return {
        k: v
        for k, v in batch.items()
        if not k.startswith("_") and k not in ("question_id", "train_acc_mask")
    }


def _local_rows(arr) -> np.ndarray:
    """Rows of a (possibly multi-host global) batch-sharded array that this
    process owns, in ascending global-row order — aligned with the local
    host-side lists a process-sharded EpochBatcher produced.

    Under tensor parallelism the model-axis replicas surface one
    addressable shard PER REPLICA for the same row block, so shards are
    deduped by their row slice before concatenating (otherwise predictions
    would be paired with the wrong ground-truth rows)."""
    if getattr(arr, "is_fully_addressable", True) is False:
        by_rows = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            by_rows.setdefault(start, s)  # keep one replica per row block
        shards = [by_rows[k] for k in sorted(by_rows)]
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(arr)


def _batch_accuracy(pred_ids, batch, answer_vocab, eos_idx, metric_evaluator):
    """Teacher-forced train accuracy on the host.

    Matches the reference exactly: task_utils.py:130-133 calls
    ``TextVQAAccuracy.calculate`` (sam/datasets/metrics.py:21-68), which
    decodes the per-step argmaxes of the teacher-forced scores, stops at
    EOS, and computes the VQA soft metric against the 10 raw answers. Note
    the reference does NOT consume ``train_acc_mask`` here — processors.py
    produces it (:682-692) but no caller reads it; the EOS stop in decoding
    plays the same role. We ship ``train_acc_mask`` in the batch for
    content parity but likewise score the EOS-stopped decode."""
    from ..evaluation.metrics import decode_predictions

    real = batch.get("_real_count", pred_ids.shape[0])
    decoded = decode_predictions(
        _local_rows(pred_ids)[:real],
        batch["_ocr_tokens"][:real],
        answer_vocab.word_list,
        eos_idx,
    )
    preds = [
        {"pred_answer": d["pred_answer"], "gt_answers": list(a)}
        for d, a in zip(decoded, batch["_answers"][:real])
        if a
    ]
    if not preds:
        return 0.0
    acc, _ = metric_evaluator.eval_pred_list(preds)
    return acc


def train(
    task_cfg: TaskConfig,
    model,
    params,
    train_batcher: EpochBatcher,
    val_batcher: Optional[EpochBatcher],
    answer_vocab,
    save_dir: str,
    num_epochs: int,
    seed: int = 0,
    resume: bool = False,
    log_every: int = 20,
    max_steps: Optional[int] = None,
    mesh=None,
    model_parallel: int = 1,
    grad_accum: int = 1,
) -> TrainState:
    """Mesh-aware training driver. With ``mesh`` (or >1 local device), the
    batch is sharded over the ``data`` axis and — when ``model_parallel>1``
    — weights over the ``model`` axis; XLA emits the ICI collectives.
    ``grad_accum=N`` scans the batch as N microbatches per optimizer update
    (same update up to float reassociation; ~N× less activation memory —
    see training/step.py)."""
    optimizer = make_optimizer(params, task_cfg)
    state = create_train_state(params, optimizer)

    data_sharding = None
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh

        # use as many devices as the batch size divides into evenly
        bs = train_batcher.batch_size
        dp = len(jax.devices()) // model_parallel
        while dp > 1 and bs % dp != 0:
            dp -= 1
        n_use = dp * model_parallel
        if n_use > 1:
            mesh = make_mesh(n_use, model_parallel=model_parallel)
        else:
            logger.info(
                "batch size %d not divisible across %d devices; "
                "running single-device", bs, len(jax.devices()),
            )
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, shard_params

        p_shard = shard_params(params, mesh, tensor_parallel=model_parallel > 1)
        state = state._replace(params=jax.device_put(state.params, p_shard))
        data_sharding = batch_sharding(mesh)
        logger.info(
            "training over mesh %s (dp=%d x tp=%d)",
            mesh.shape, mesh.shape["data"], mesh.shape["model"],
        )
    start_epoch = 0
    best_val_score, best_val_step = -1.0, -1

    ckpt_path = os.path.join(save_dir, "best_model")
    resume_path = os.path.join(save_dir, "last_state")
    if resume and os.path.exists(resume_path):
        restored = restore_checkpoint(resume_path, state)
        state = TrainState(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        start_epoch = int(restored["meta"]["epoch_id"]) + 1
        best_val_score = float(restored["meta"]["val_score"])
        # sync the batcher's epoch counter: shuffle order and target
        # sampling are keyed on (seed, batcher.epoch), and a fresh process
        # starts the counter at 0 — without this, a resumed run would
        # replay epoch 0's data order/targets in epoch start_epoch, so a
        # resumed run would NOT be bit-identical to an uninterrupted one
        # (tests/test_training.py::test_resume_is_bit_deterministic)
        for batcher in (train_batcher, val_batcher):
            if batcher is not None and hasattr(batcher, "epoch"):
                batcher.epoch = start_epoch
        logger.info(
            "resumed from %s at step %d epoch %d", resume_path,
            int(state.step), start_epoch,
        )

    train_step = jax.jit(
        make_train_step(model, optimizer, grad_accum=grad_accum),
        donate_argnums=0,
    )
    rng = jax.random.PRNGKey(seed)
    evaluator = Evaluator(model, answer_vocab, metric=task_cfg.metric)
    special = answer_vocab.special_ids()

    # elastic shutdown: on SIGTERM/SIGINT finish the in-flight step, write
    # last_state, and return cleanly so --resume continues from here (goes
    # beyond the reference, which loses all progress on preemption)
    interrupted = threading.Event()
    prev_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _on_signal(signum, frame):
            logger.warning(
                "caught signal %d; checkpointing to %s after this step",
                signum, resume_path,
            )
            interrupted.set()

        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _on_signal)

    # multi-host sharded input: a process-sharded batcher yields only this
    # host's row slice; global arrays are stitched per shard
    process_local = (
        jax.process_count() > 1
        and getattr(train_batcher, "process_count", 1) == jax.process_count()
    )

    stop = False
    for epoch_id in range(start_epoch, num_epochs):
        losses = []
        t_window = time.time()
        samples_window = 0
        from ..data.prefetch import prefetch_to_device

        def host_side(batch):
            # keep eval-side keys on host; ship the rest ahead of time
            return {
                ("_question_id" if k == "question_id" else k): v
                for k, v in batch.items()
            }

        batches = prefetch_to_device(
            (host_side(b) for b in train_batcher.epoch_batches()),
            size=2,
            sharding=data_sharding,
            process_local=process_local,
            # ship features in the compute dtype: bit-identical for bf16
            # models (first device op is .astype(model.dtype)) and half
            # the host->device bytes (prefetch.py)
            feature_dtype=model.dtype,
        )
        for it, batch in enumerate(batches):
            device_batch = _device_view(batch)
            state, metrics = train_step(state, device_batch, rng)
            losses.append(metrics["loss"])  # device scalar; fetched lazily
            samples_window += batch.get("_real_count", len(batch["_answers"]))
            if it % log_every == 0 and it != 0:
                acc = _batch_accuracy(
                    metrics["pred_ids"], batch, answer_vocab, special.eos,
                    evaluator.metric_evaluator,
                )
                loss_avg = float(jnp.mean(jnp.stack(losses)))
                if not np.isfinite(loss_avg):
                    raise FloatingPointError(
                        f"non-finite loss {loss_avg} at epoch {epoch_id} "
                        f"iter {it} (step {int(state.step)})"
                    )
                dt = time.time() - t_window
                logger.info(
                    "epoch %d iter %d | loss %.4f | acc %.4f | %.1f samples/s",
                    epoch_id, it, loss_avg, acc, samples_window / dt,
                )
                losses, t_window, samples_window = [], time.time(), 0
            if interrupted.is_set():
                save_checkpoint(
                    resume_path, state,
                    epoch_id=epoch_id - 1,  # epoch incomplete: redo on resume
                    val_score=best_val_score,
                )
                logger.info(
                    "interrupted at step %d; last_state saved, exiting",
                    int(state.step),
                )
                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
                return state
            if max_steps is not None and int(state.step) >= max_steps:
                stop = True
                break

        # per-epoch validation (reference train.py:162-171)
        if val_batcher is not None:
            result = evaluator.run_split(state.params, val_batcher.epoch_batches())
            val_score = result["accuracy"] if result["accuracy"] is not None else 0.0
            logger.info(
                "[validation] epoch %d VQA %.4f (best %.4f @ step %d)",
                epoch_id, val_score, best_val_score, best_val_step,
            )
            if val_score > best_val_score:
                best_val_score, best_val_step = val_score, int(state.step)
                save_checkpoint(
                    ckpt_path, state, epoch_id=epoch_id, val_score=val_score
                )
                logger.info("saved best checkpoint to %s", ckpt_path)
        save_checkpoint(
            resume_path, state, epoch_id=epoch_id, val_score=best_val_score
        )
        if stop:
            break
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    return state
