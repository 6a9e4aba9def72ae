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


def _setup(**mmt_overrides):
    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 2}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
        **mmt_overrides,
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


def test_name_map_covers_bias_and_aux_params():
    """use_bias spatial head biases (reference sa_m4c.py:439-443) and the
    aux spatial head (reference :173-177) must all have converter entries."""
    task, model, batch, params = _setup(use_bias=True, use_aux_heads=True)
    name_map = reference_name_map(list(task.mmt.layer_type_list),
                                  task.text_bert.num_hidden_layers)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    unmapped = []
    for path, _ in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys not in name_map:
            unmapped.append(keys)
    assert not unmapped, unmapped
    # and a full round trip with those params populated
    rng = np.random.RandomState(1)
    state_dict = {
        name_map[tuple(p.key for p in path if hasattr(p, "key"))]:
            rng.randn(*leaf.shape).astype(np.float32)
        for path, leaf in flat
    }
    converted, missing = convert_torch_state_dict(
        state_dict, params, strict=True
    )
    assert not missing
    biases_src = "mmt.encoder.spatial_layers.0.attention.self.biases.weight"
    np.testing.assert_array_equal(
        np.asarray(converted["mmt"]["spatial_layer_0"]["attention_self"]["biases"]),
        state_dict[biases_src],
    )
    np.testing.assert_array_equal(
        np.asarray(converted["origin_transform"]["dense0"]["weight"]),
        state_dict["origin_transform.logit_fc.0.weight"],
    )


def test_convert_strict_raises_on_missing():
    task, model, batch, params = _setup(use_bias=True)
    # an empty state dict leaves every template leaf unsourced
    with pytest.raises(ValueError, match="strict conversion"):
        convert_torch_state_dict({}, params, strict=True)
    # non-strict keeps the template values and reports them
    converted, missing = convert_torch_state_dict({}, params, strict=False)
    assert len(missing) == len(jax.tree.leaves(params))


def test_init_text_bert_from_bert_base(tmp_path):
    """A synthetic bert-base-layout torch checkpoint (with ``bert.`` prefix
    and gamma/beta LayerNorm aliases) hydrates exactly the text_bert subtree
    (reference TextBert.from_pretrained, sa_m4c.py:75-82)."""
    import torch

    from sam_textvqa_tpu.utils.checkpoint import (
        bert_base_name_map,
        init_text_bert_from_bert_base,
    )

    task, model, batch, params = _setup()
    name_map = bert_base_name_map(task.text_bert.num_hidden_layers)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rng = np.random.RandomState(2)
    sd = {}
    expected = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys[0] != "text_bert":
            continue
        src = name_map[keys]
        arr = rng.randn(*leaf.shape).astype(np.float32)
        # exercise prefix stripping + the pytorch_transformers-era gamma/beta
        src = src.replace("LayerNorm.weight", "LayerNorm.gamma")
        src = src.replace("LayerNorm.bias", "LayerNorm.beta")
        sd["bert." + src] = torch.from_numpy(arr)
        expected[keys] = arr
    # extra bert-base keys our 2-layer text_bert doesn't use must be ignored
    sd["bert.encoder.layer.11.intermediate.dense.weight"] = torch.zeros(2, 2)
    sd["cls.predictions.bias"] = torch.zeros(4)
    path = tmp_path / "bert_base.bin"
    torch.save(sd, str(path))

    new_params, n_loaded, missing = init_text_bert_from_bert_base(
        params, str(path)
    )
    assert not missing, missing
    assert n_loaded == len(expected)
    for p, leaf in jax.tree_util.tree_flatten_with_path(new_params)[0]:
        keys = tuple(k.key for k in p if hasattr(k, "key"))
        if keys[0] == "text_bert":
            np.testing.assert_array_equal(np.asarray(leaf), expected[keys])
    # non-text_bert leaves untouched
    np.testing.assert_array_equal(
        np.asarray(new_params["classifier_weight"]),
        np.asarray(params["classifier_weight"]),
    )
    # hydrated params still run
    out = model.apply({"params": new_params}, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_frcn_finetune_convert_and_detectron_apply(tmp_path):
    """finetune_faster_rcnn_fpn_fc7 params must have converter entries
    (reference keys ``*_faster_rcnn_fc7.module.lc.*``) and the detectron
    pickle application path (reference textvqa_encoders.py:46-57) must
    install into BOTH encoder modules."""
    import pickle

    from sam_textvqa_tpu.models.encoders import apply_detectron_fc7_weights

    task, model, batch, params = _setup(
        frcn_encoder_type="finetune_faster_rcnn_fpn_fc7"
    )
    assert "lc" in params["obj_faster_rcnn_fc7"]

    # converter coverage + strict round trip
    name_map = reference_name_map(list(task.mmt.layer_type_list),
                                  task.text_bert.num_hidden_layers)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rng = np.random.RandomState(2)
    state_dict = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        assert keys in name_map, keys
        state_dict[name_map[keys]] = rng.randn(*leaf.shape).astype(np.float32)
    converted, missing = convert_torch_state_dict(state_dict, params, strict=True)
    assert not missing
    np.testing.assert_array_equal(
        np.asarray(converted["ocr_faster_rcnn_fc7"]["lc"]["weight"]),
        state_dict["ocr_faster_rcnn_fc7.module.lc.weight"],
    )

    # detectron pickle application
    w = rng.randn(2048, 2048).astype(np.float32)
    b = rng.randn(2048).astype(np.float32)
    wf, bf = str(tmp_path / "fc7_w.pkl"), str(tmp_path / "fc7_b.pkl")
    with open(wf, "wb") as f:
        pickle.dump(w, f)
    with open(bf, "wb") as f:
        pickle.dump(b, f)
    new_params, installed = apply_detectron_fc7_weights(params, wf, bf)
    assert installed == ["obj_faster_rcnn_fc7", "ocr_faster_rcnn_fc7"]
    for mod in installed:
        np.testing.assert_array_equal(
            np.asarray(new_params[mod]["lc"]["weight"]), w
        )
        np.testing.assert_array_equal(np.asarray(new_params[mod]["lc"]["bias"]), b)
    # untouched elsewhere + still runs
    np.testing.assert_array_equal(
        np.asarray(new_params["classifier_weight"]),
        np.asarray(params["classifier_weight"]),
    )
    out = model.apply({"params": new_params}, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["scores"])).all()
    # "default" encoders have no params -> application is a no-op
    _, _, _, params_default = _setup()
    _, installed_default = apply_detectron_fc7_weights(params_default, wf, bf)
    assert installed_default == []
