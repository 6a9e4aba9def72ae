"""End-to-end 'real data' path: generated imdb .npy files + an npz feature
directory driven through `python train.py` WITHOUT --synthetic — exercising
build_dataset, offline preprocessing + cache, vocab loading, training, val,
and eval dumps exactly as a user with downloaded data would."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_data(root, n_images=6, n_q=10):
    rng = np.random.RandomState(0)
    feat_dir = root / "features"
    ocr_dir = root / "ocr_features"
    feat_dir.mkdir()
    ocr_dir.mkdir()
    words = ["stop", "exit", "cola", "open", "sale", "bus"]
    for i in range(n_images):
        for d, n in ((feat_dir, 9), (ocr_dir, 4)):
            boxes = rng.rand(n, 4) * 100
            boxes[:, 2:] += boxes[:, :2] + 5
            np.savez(
                d / f"img{i}.npz",
                features=rng.randn(n, 2048).astype(np.float32),
                boxes=boxes.astype(np.float32),
                image_w=200, image_h=100,
            )
    entries = [{"dataset": "fixture"}]
    for q in range(n_q):
        img = q % n_images
        toks = [words[rng.randint(len(words))] for _ in range(3)]
        entries.append(
            {
                "question": f"what does sign {q} say",
                "question_id": 1000 + q,
                "image_id": f"img{img}",
                "image_height": 100,
                "image_width": 200,
                "answers": [toks[0]] * 10,
                "google_ocr_tokens_filtered": toks,
            }
        )
    for split in ("train", "val", "test"):
        np.save(root / f"imdb_{split}.npy",
                np.array(entries, dtype=object), allow_pickle=True)
    vocab = root / "vocab5k.txt"
    vocab.write_text("\n".join(["<pad>", "<s>", "</s>", "<unk>"] + words) + "\n")
    return feat_dir, ocr_dir, vocab


def _config(tmp_path, feat_dir, ocr_dir, vocab):
    with open(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg["SA-M4C"].update(
        hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=6, max_ocr_num=4, num_decoding_steps=4, max_seq_length=8,
    )
    cfg["TextBERT"].update(num_hidden_layers=1, hidden_size=48,
                           intermediate_size=96, num_attention_heads=4)
    cfg.update(
        max_obj_num=6, max_ocr_num=4, max_seq_length=8, batch_size=4,
        warmup_iters=2, output_dir=str(tmp_path / "save"),
        # npz feature dirs ignore the trainval/test format slot
        textvqa_obj=str(feat_dir) + "{}",
        textvqa_ocr=str(ocr_dir) + "{}",
        textvqa_imdb=str(tmp_path / "imdb_{}.npy"),
        textvqa_spatial_cache=str(tmp_path / "cache_{}.pkl"),
    )
    cfg["Vocabs"]["vocab5k"] = str(vocab)
    path = tmp_path / "fixture.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _npz_dir_to_lmdb(npz_dir, out_path):
    """Convert a directory of <image_id>.npz fixtures into the reference's
    shipping LMDB layout (actual data.mdb bytes)."""
    from sam_textvqa_tpu.data.lmdb_io import write_reference_feature_lmdb

    images = {}
    for name in os.listdir(npz_dir):
        if not name.endswith(".npz"):
            continue
        with np.load(os.path.join(npz_dir, name)) as z:
            images[name[:-4].replace("__", "/")] = {
                "features": z["features"],
                "boxes": z["boxes"],
                "image_w": float(z["image_w"]),
                "image_h": float(z["image_h"]),
            }
    write_reference_feature_lmdb(str(out_path), images)
    return out_path


@pytest.mark.slow
def test_train_on_real_lmdb_files(tmp_path):
    """The LMDB dress rehearsal: the same generated imdb .npy pipeline, but
    features packed into ACTUAL LMDB environments (real data.mdb bytes in
    the reference's serialized layout, reference
    _image_features_reader.py:66-188) and driven through `python train.py`
    with zero code changes — the config just points at the .lmdb dirs."""
    feat_dir, ocr_dir, vocab = _make_data(tmp_path)
    for fmt in ("trainval", "test"):
        _npz_dir_to_lmdb(feat_dir, tmp_path / f"obj_{fmt}")
        _npz_dir_to_lmdb(ocr_dir, tmp_path / f"ocr_{fmt}")
    # OCR word vectors from a real fastText .bin (the reference's wiki.en.bin
    # path, processors.py:191-200) — written in the library's on-disk format
    # and ingested by the pure-Python reader (no native lib in-container)
    from sam_textvqa_tpu.data.fasttext_bin import write_fasttext_bin

    ft_words = ["stop", "exit", "cola", "open", "sale", "bus"]
    ft_bin = tmp_path / "wiki.fixture.bin"
    write_fasttext_bin(
        str(ft_bin),
        ft_words,
        np.random.RandomState(3).randn(len(ft_words), 300).astype(np.float32),
        bucket=512,
    )
    cfg_path = _config(tmp_path, feat_dir, ocr_dir, vocab)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["textvqa_obj"] = str(tmp_path / "obj_{}")
    cfg["textvqa_ocr"] = str(tmp_path / "ocr_{}")
    cfg["fasttext_bin"] = str(ft_bin)
    open(cfg_path, "w").write(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "train.py", "--config", cfg_path, "--tag", "lmdbpath",
         "--max_steps", "2", "--num_train_epochs", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # the .bin was actually used: the hash-noise fallback warning is absent
    assert "hash noise" not in (r.stderr + r.stdout)
    save_dir = tmp_path / "save" / "lmdbpath"
    preds = json.loads((save_dir / "evalai_val.json").read_text())
    assert len(preds) == 10
    assert all(isinstance(p["answer"], str) for p in preds)


@pytest.mark.slow
def test_train_on_generated_files(tmp_path):
    feat_dir, ocr_dir, vocab = _make_data(tmp_path)
    # the "{}" format slot would break npz dirs; symlink the expected names
    os.symlink(feat_dir, str(feat_dir) + "trainval")
    os.symlink(ocr_dir, str(ocr_dir) + "trainval")
    os.symlink(feat_dir, str(feat_dir) + "test")
    os.symlink(ocr_dir, str(ocr_dir) + "test")
    # a missing optional split must not block training (only train is
    # required; the reference crashes in this case)
    os.remove(tmp_path / "imdb_test.npy")
    cfg = _config(tmp_path, feat_dir, ocr_dir, vocab)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "train.py", "--config", cfg, "--tag", "realpath",
         "--max_steps", "2", "--num_train_epochs", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    save_dir = tmp_path / "save" / "realpath"
    preds = json.loads((save_dir / "evalai_val.json").read_text())
    assert len(preds) == 10
    assert all(isinstance(p["answer"], str) for p in preds)
    # preprocessing cache was written and is reused on the second run
    assert (tmp_path / "cache_train.pkl").exists()
    r2 = subprocess.run(
        [sys.executable, "train.py", "--config", cfg, "--tag", "realpath2",
         "--max_steps", "1", "--num_train_epochs", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "loading preprocessed cache" in (r2.stderr + r2.stdout)
