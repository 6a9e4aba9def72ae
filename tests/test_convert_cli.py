"""End-to-end checkpoint conversion: build a reference-layout torch
best_model.tar, run tools/convert_checkpoint.py, then eval from the
converted checkpoint through train.py --pretrained_eval."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_convert_and_eval(tmp_path):
    # tiny config
    with open(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg["SA-M4C"].update(
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=5, num_decoding_steps=4, max_seq_length=8,
    )
    cfg["TextBERT"].update(num_hidden_layers=1, hidden_size=48,
                           intermediate_size=96, num_attention_heads=4)
    num_answers = 44
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text(
        "\n".join(["<pad>", "<s>", "</s>", "<unk>"]
                  + [f"w{i}" for i in range(num_answers - 4)]) + "\n"
    )
    cfg["Vocabs"]["vocab5k"] = str(vocab_path)
    cfg.update(max_obj_num=8, max_ocr_num=5, max_seq_length=8, batch_size=8,
               output_dir=str(tmp_path / "save"))
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    # synthesize a reference-layout state dict from our name map
    sys.path.insert(0, REPO)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.utils.checkpoint import reference_name_map

    task = load_task_config(str(cfg_path))
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, num_answers))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(make_batch(task, 2, num_answers_vocab=num_answers)).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    name_map = reference_name_map(
        list(task.mmt.layer_type_list), task.text_bert.num_hidden_layers
    )
    rng = np.random.RandomState(0)
    state_dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        state_dict["module." + name_map[keys]] = torch.tensor(
            rng.randn(*leaf.shape).astype(np.float32)
        )
    torch_ckpt = tmp_path / "best_model.tar"
    torch.save(
        {"model_state_dict": state_dict, "epoch_id": 7,
         "current_val_score": 0.33, "global_step": 123},
        str(torch_ckpt),
    )

    out_ckpt = tmp_path / "converted" / "best_model"
    r = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py",
         "--torch_ckpt", str(torch_ckpt), "--config", str(cfg_path),
         "--num_answers", str(num_answers), "--out", str(out_ckpt)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "converted checkpoint written" in r.stdout
    assert "WARNING" not in r.stdout, r.stdout

    r2 = subprocess.run(
        [sys.executable, "train.py", "--config", str(cfg_path),
         "--tag", "conv", "--synthetic", "16", "--batch_size", "8",
         "--pretrained_eval", str(out_ckpt)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert (tmp_path / "converted" / "evalai_val.json").exists()


def test_export_roundtrip_bitwise(tmp_path):
    """orbax -> tools/export_checkpoint.py -> reference .tar ->
    convert_torch_state_dict back: every parameter bit-identical. Proves
    the export is the exact inverse of the import (the in-suite oracle
    separately proves the exported names drive the reference's own model)."""
    with open(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg["SA-M4C"].update(
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=5, num_decoding_steps=4, max_seq_length=8,
    )
    cfg["TextBERT"].update(num_hidden_layers=1, hidden_size=48,
                           intermediate_size=96, num_attention_heads=4)
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state
    from sam_textvqa_tpu.utils.checkpoint import (
        convert_torch_state_dict,
        save_checkpoint,
    )

    num_answers = 44
    task = load_task_config(str(cfg_path))
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, num_answers))
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task, 2, num_answers_vocab=num_answers)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(3)}, batch)["params"]
    state = create_train_state(params, make_optimizer(params, task))
    state = state._replace(step=jnp.asarray(17))
    ckpt_dir = tmp_path / "orbax" / "best_model"
    save_checkpoint(str(ckpt_dir), state, epoch_id=1, val_score=0.5)

    tar = tmp_path / "exported" / "best_model.tar"
    r = subprocess.run(
        [sys.executable, "tools/export_checkpoint.py",
         "--ckpt", str(ckpt_dir), "--config", str(cfg_path),
         "--num_answers", str(num_answers), "--out", str(tar), "--strict"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "exported" in r.stdout

    ckpt = torch.load(str(tar), map_location="cpu")
    assert ckpt["global_step"] == 17
    sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    back = convert_torch_state_dict(sd, params, strict=True)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b),
            err_msg=str(jax.tree_util.keystr(path)),
        )
