"""Training-stack tests: loss vs torch BCE, LR schedule vs a python bisect
oracle, per-module LR scaling, and a tiny overfit run."""

import dataclasses
from bisect import bisect

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.training.loss import m4c_decoding_bce_with_mask
from sam_textvqa_tpu.training.optimizer import (
    lr_factor_schedule,
    make_optimizer,
    param_lr_scales,
)
from sam_textvqa_tpu.training.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

NUM_ANSWERS = 50


def _tiny_task():
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {}, "warmup_iters": 5,
         "lr_decay_iters": [1000, 2000], "lr": 3e-3}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
        obj_drop=0.0, ocr_drop=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return dataclasses.replace(cfg, mmt=mmt, text_bert=tb)


def test_loss_matches_torch_bce():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    scores = rng.randn(4, 5, 30).astype(np.float32)
    targets = (rng.rand(4, 5, 30) < 0.1).astype(np.float32)
    mask = (rng.rand(4, 5) < 0.7).astype(np.float32)

    ours = float(m4c_decoding_bce_with_mask(
        jnp.asarray(scores), jnp.asarray(targets), jnp.asarray(mask)
    ))
    t_losses = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(scores), torch.tensor(targets), reduction="none"
    )
    t_losses = t_losses * torch.tensor(mask).unsqueeze(-1)
    expected = float(
        t_losses.sum() / torch.max(torch.tensor(mask).sum(), torch.tensor(1.0))
    )
    assert ours == pytest.approx(expected, rel=1e-5)


def test_loss_zero_mask_clamps_denominator():
    scores = jnp.ones((2, 3, 4))
    targets = jnp.zeros((2, 3, 4))
    mask = jnp.zeros((2, 3))
    assert float(m4c_decoding_bce_with_mask(scores, targets, mask)) == 0.0


def test_lr_schedule_matches_reference_lambda():
    """Oracle: the reference lr_update (task_utils.py:48-56)."""
    task = task_config_from_dict(
        {"warmup_iters": 1000, "warmup_factor": 0.2,
         "lr_decay_iters": [14000, 19000], "lr_decay": 0.1}
    )
    factor = lr_factor_schedule(task)

    def ref_lr_update(it):
        if it <= 1000:
            alpha = float(it) / 1000.0
            return 0.2 * (1.0 - alpha) + alpha
        return pow(0.1, bisect([14000, 19000], it))

    for it in [0, 1, 500, 999, 1000, 1001, 13999, 14000, 14001, 18999,
               19000, 19001, 50000]:
        assert float(factor(jnp.asarray(it))) == pytest.approx(
            ref_lr_update(it), rel=1e-6
        ), it


def test_param_lr_scales():
    task = _tiny_task()
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    scale_tree, flat = param_lr_scales(params, task)
    assert all(v == 0.1 for k, v in flat.items() if k.startswith("['text_bert']"))
    assert all(v == 1.0 for k, v in flat.items() if k.startswith("['mmt']"))
    assert flat["['classifier_weight']"] == 1.0


def test_overfit_tiny_batch():
    """A handful of steps on one batch must reduce the loss (end-to-end
    gradient flow through spatial layers, pointer net, tied classifier)."""
    task = _tiny_task()
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_batch(task, 4, num_answers_vocab=NUM_ANSWERS)).items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    train_step = jax.jit(make_train_step(model, optimizer))
    rng = jax.random.PRNGKey(42)

    losses = []
    for _ in range(30):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(state.step) == 30
    eval_step = jax.jit(make_eval_step(model))
    ev = eval_step(state.params, batch)
    assert np.isfinite(float(ev["loss"]))
    assert ev["pred_ids"].shape == batch["train_prev_inds"].shape


def test_grad_clip_bounds_update_norm():
    task = _tiny_task()
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    # scale targets to produce a huge gradient; the clip keeps Adam's input
    # bounded so params stay finite
    batch = dict(batch)
    batch["targets"] = batch["targets"] * 1e4
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    train_step = jax.jit(make_train_step(model, optimizer))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    finite = all(np.isfinite(np.asarray(p)).all() for p in jax.tree.leaves(state.params))
    assert finite


def test_local_rows_dedups_model_axis_replicas():
    """Under multi-host tensor parallelism every model-axis replica
    surfaces an addressable shard for the SAME row block; _local_rows must
    keep one replica per row block or train-accuracy pairs predictions
    with the wrong ground-truth rows (round-3 review finding)."""
    import numpy as np

    from sam_textvqa_tpu.training.loop import _local_rows

    class Shard:
        def __init__(self, start, rows):
            self.index = (slice(start, start + rows.shape[0]),)
            self.data = rows

    class FakeGlobalArray:
        is_fully_addressable = False

        def __init__(self, shards):
            self.addressable_shards = shards

    rows0 = np.arange(8).reshape(2, 4)
    rows1 = np.arange(8, 16).reshape(2, 4)
    # dp x tp mesh: each row block appears once PER model-axis replica
    arr = FakeGlobalArray(
        [Shard(0, rows0), Shard(0, rows0), Shard(2, rows1), Shard(2, rows1)]
    )
    out = _local_rows(arr)
    np.testing.assert_array_equal(out, np.concatenate([rows0, rows1]))

    # dp-only (no replicas) still concatenates in row order
    arr = FakeGlobalArray([Shard(2, rows1), Shard(0, rows0)])
    np.testing.assert_array_equal(
        _local_rows(arr), np.concatenate([rows0, rows1])
    )


def test_resume_is_bit_deterministic(tmp_path):
    """An interrupted-and-resumed run must be BIT-identical to an
    uninterrupted one: per-step dropout RNG is folded on state.step, the
    epoch shuffle/target sampling is keyed on (seed, batcher.epoch), and
    resume must sync the fresh batcher's epoch counter to start_epoch
    (training/loop.py) — without that sync the resumed epoch replays
    epoch 0's data order and the trajectories diverge silently."""
    from sam_textvqa_tpu.config import task_config_from_dict
    from sam_textvqa_tpu.data.dataset import EpochBatcher
    from sam_textvqa_tpu.data.synthetic import SyntheticDataset
    from sam_textvqa_tpu.data.vocab import VocabDict
    from sam_textvqa_tpu.training.loop import train

    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1},
         "warmup_iters": 2, "lr": 1e-3}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=8,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    words = ["<pad>", "<s>", "</s>", "<unk>"] + [f"w{i}" for i in range(40)]
    vocab = VocabDict(words)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, len(vocab)))
    ds = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch(range(2)).items()
             if not k.startswith("_") and k != "question_id"}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    def fresh_params():
        # train_step donates its state, so each run needs its own buffers
        return jax.tree.map(lambda x: x.copy(), params)

    def batchers():
        return (
            EpochBatcher(SyntheticDataset(task, 12, num_answers_vocab=len(vocab)), 8),
            EpochBatcher(SyntheticDataset(task, 8, seed=1, num_answers_vocab=len(vocab)),
                         8, shuffle=False),
        )

    # A: two epochs, uninterrupted
    tr, val = batchers()
    state_a = train(task, model, fresh_params(), tr, val, vocab,
                    save_dir=str(tmp_path / "a"), num_epochs=2)

    # B: one epoch, then a FRESH process-equivalent resume for epoch 2
    tr, val = batchers()
    train(task, model, fresh_params(), tr, val, vocab,
          save_dir=str(tmp_path / "b"), num_epochs=1)
    tr, val = batchers()  # fresh batchers: epoch counters back at 0
    state_b = train(task, model, fresh_params(), tr, val, vocab,
                    save_dir=str(tmp_path / "b"), num_epochs=2, resume=True)

    assert int(state_a.step) == int(state_b.step)
    flat_a = jax.tree_util.tree_leaves_with_path(state_a.params)
    flat_b = jax.tree_util.tree_leaves_with_path(state_b.params)
    assert len(flat_a) == len(flat_b)
    for (path_a, leaf_a), (_, leaf_b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(leaf_b),
            err_msg=f"resume diverged at {jax.tree_util.keystr(path_a)}",
        )


def test_grad_accum_matches_full_batch_step():
    """--grad_accum N must reproduce the full-batch update: the loss
    normalizer is the GLOBAL unmasked count and clipping acts on the
    averaged gradient, so microbatch accumulation differs only by float
    reassociation (dropout is 0 in _tiny_task, making the paths
    deterministic). Covers loss scalar, pred_ids row order (strided
    split + inverse), and the multi-step parameter trajectory."""
    task = _tiny_task()
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_batch(task, 8, num_answers_vocab=NUM_ANSWERS)).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    optimizer = make_optimizer(params, task)
    rng = jax.random.PRNGKey(7)

    trajectories = {}
    for accum in (1, 4):
        state = create_train_state(params, optimizer)
        step = jax.jit(make_train_step(model, optimizer, grad_accum=accum))
        losses, preds = [], []
        for _ in range(3):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
            preds.append(np.asarray(metrics["pred_ids"]))
        trajectories[accum] = (losses, preds, state.params)

    l1, p1, params1 = trajectories[1]
    l4, p4, params4 = trajectories[4]
    np.testing.assert_allclose(l1, l4, rtol=2e-5)
    for a, b in zip(p1, p4):
        assert a.shape == b.shape
        # argmax ids agree wherever logits aren't reassociation-tied
        assert (a == b).mean() > 0.99
    flat1 = jax.tree.leaves(params1)
    flat4 = jax.tree.leaves(params4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_grad_accum_rejects_indivisible_batch():
    task = _tiny_task()
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_batch(task, 6, num_answers_vocab=NUM_ANSWERS)).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(model, optimizer, grad_accum=4))
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.PRNGKey(0))
