"""Checkpoint tests: orbax save/restore round trip and the reference
torch-state-dict converter (synthetic state dict in the reference layout)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.training.optimizer import make_optimizer
from sam_textvqa_tpu.training.step import TrainState, create_train_state, make_train_step
from sam_textvqa_tpu.utils.checkpoint import (
    convert_torch_state_dict,
    reference_name_map,
    restore_checkpoint,
    save_checkpoint,
)

NUM_ANSWERS = 30


def _setup():
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=4
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, batch, params


def test_save_restore_roundtrip(tmp_path):
    task, model, batch, params = _setup()
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(model, optimizer))
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(str(tmp_path / "ck"), state, epoch_id=3, val_score=0.42)
    restored = restore_checkpoint(str(tmp_path / "ck"), state)
    assert int(restored["step"]) == 1
    assert int(restored["meta"]["epoch_id"]) == 3
    assert float(restored["meta"]["val_score"]) == pytest.approx(0.42)
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training
    state2 = TrainState(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(restored["opt_state"]),
        ),
    )
    state2, metrics = step(state2, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_name_map_covers_all_params():
    task, model, batch, params = _setup()
    name_map = reference_name_map(list(task.mmt.layer_type_list),
                                  task.text_bert.num_hidden_layers)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    unmapped = []
    for path, _ in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys not in name_map:
            unmapped.append(keys)
    assert not unmapped, unmapped


def test_convert_torch_state_dict():
    """Build a synthetic torch-layout state dict (reference module names)
    and check values land on the right leaves."""
    task, model, batch, params = _setup()
    name_map = reference_name_map(list(task.mmt.layer_type_list),
                                  task.text_bert.num_hidden_layers)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rng = np.random.RandomState(0)
    state_dict = {}
    expected = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        src = name_map[keys]
        arr = rng.randn(*leaf.shape).astype(np.float32)
        # simulate the DataParallel prefix the reference evaluator strips
        state_dict["module." + src] = arr
        expected[keys] = arr
    converted, missing = convert_torch_state_dict(state_dict, params)
    assert not missing, missing
    for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        np.testing.assert_array_equal(np.asarray(leaf), expected[keys])
    # converted params run a forward pass
    out = model.apply({"params": converted}, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["scores"])).all()
