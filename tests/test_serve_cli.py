"""End-to-end serving CLI tests: `python serve.py` demo mode and the
JSON-lines TCP endpoint, on a tiny model over synthetic requests (CPU)."""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_config(tmp_path):
    with open(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg["SA-M4C"].update(
        hidden_size=48, ptr_query_size=48, max_obj_num=8, max_ocr_num=5,
        num_decoding_steps=4, max_seq_length=8, intermediate_size=96,
    )
    cfg["TextBERT"].update(
        num_hidden_layers=1, hidden_size=48, intermediate_size=96,
        num_attention_heads=4,
    )
    cfg.update(output_dir=str(tmp_path / "save"))
    path = tmp_path / "tiny.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_serve_demo(tmp_path):
    cfg = _tiny_config(tmp_path)
    r = subprocess.run(
        [sys.executable, "serve.py", "--config", cfg, "--demo", "24",
         "--concurrency", "4", "--buckets", "1,4", "--max_wait_ms", "5"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["requests"] == 24
    assert stats["errors"] == []
    assert stats["latency_ms_p50"] > 0
    assert sum(stats["occupancy"].values()) == stats["batches"]


@pytest.mark.slow
def test_serve_demo_data_parallel(tmp_path):
    """`serve.py --data_parallel 4`: the engine decodes each coalesced
    batch row-sharded over a pure-DP mesh (XLA_FLAGS virtual devices);
    the demo must complete with zero errors — answer parity vs a
    replicated engine is covered in-process by
    tests/test_serving.py::test_dp_sharded_engine_matches_replicated."""
    env = _env()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    cfg = _tiny_config(tmp_path)
    r = subprocess.run(
        [sys.executable, "serve.py", "--config", cfg, "--demo", "24",
         "--concurrency", "4", "--buckets", "4,8", "--max_wait_ms", "5",
         "--data_parallel", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dp=4 x tp=1" in r.stderr
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["requests"] == 24
    assert stats["errors"] == []


@pytest.mark.slow
def test_serve_tcp_endpoint(tmp_path):
    cfg = _tiny_config(tmp_path)

    # build a real request payload with the public preprocessing helper
    sys.path.insert(0, REPO)
    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.serving import build_sample

    task_cfg = load_task_config(cfg)
    rng = np.random.RandomState(0)
    sample = build_sample(
        task_cfg,
        question_indices=np.array([101, 2054, 2003, 102, 0, 0, 0, 0]),
        question_mask=np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32),
        obj_features=rng.randn(4, 2048),
        obj_boxes=np.tile([0.1, 0.1, 0.4, 0.4, 0.09], (4, 1)),
        ocr_tokens=["stop", "7"],
        ocr_features=rng.randn(2, 2048),
        ocr_boxes=np.tile([0.5, 0.5, 0.8, 0.8, 0.09], (2, 1)),
    )
    npz_path = str(tmp_path / "req.npz")
    tokens = sample.pop("ocr_tokens")
    np.savez(npz_path, **sample, ocr_tokens=np.array(tokens))

    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--config", cfg, "--port", "0",
         "--buckets", "1", "--max_wait_ms", "1"],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # first stdout line announces the bound ephemeral port
        line = proc.stdout.readline()
        deadline = time.time() + 600
        while not line.strip() and time.time() < deadline:
            assert proc.poll() is None, proc.stderr.read()[-2000:]
            line = proc.stdout.readline()
        port = json.loads(line)["listening"][1]

        with socket.create_connection(("127.0.0.1", port), timeout=300) as s:
            f = s.makefile("rw")
            for rid in (1, 2):
                f.write(json.dumps({"id": rid, "npz": npz_path}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp["id"] == rid, resp
                assert "error" not in resp, resp
                assert isinstance(resp["answer"], str)
                assert resp["latency_ms"] > 0
            # malformed request answers with an error, connection stays up
            f.write(json.dumps({"id": 3, "npz": "/nonexistent.npz"}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["id"] == 3 and "error" in resp
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_serve_from_artifact_e2e(tmp_path):
    """Full deployment dress rehearsal: train a tiny checkpoint ->
    tools/export_decode.py freezes the decode grid -> serve.py --artifact
    serves the demo from the DESERIALIZED cells (no model construction).
    Also: flags frozen by the manifest are refused loudly."""
    env = _env()
    cfg = _tiny_config(tmp_path)
    r = subprocess.run(
        [sys.executable, "train.py", "--config", cfg, "--tag", "art",
         "--synthetic", "8", "--batch_size", "4", "--max_steps", "1",
         "--num_train_epochs", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    save_dir = tmp_path / "save" / "art"
    ckpt = save_dir / "best_model"
    if not ckpt.exists():
        ckpt = save_dir / "last_state"
    art = tmp_path / "artifact"
    r = subprocess.run(
        [sys.executable, "tools/export_decode.py", "--config", cfg,
         "--checkpoint", str(ckpt), "--out", str(art),
         "--buckets", "1,4", "--ocr_bucket", "3", "--dtype", "f32",
         "--check"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (art / "manifest.json").exists()

    r = subprocess.run(
        [sys.executable, "serve.py", "--config", cfg,
         "--artifact", str(art), "--checkpoint", str(ckpt),
         "--demo", "12", "--concurrency", "4", "--max_wait_ms", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "artifact engine" in r.stderr
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["requests"] == 12
    assert stats["errors"] == []

    # manifest-frozen flags are refused, not silently ignored
    r = subprocess.run(
        [sys.executable, "serve.py", "--config", cfg,
         "--artifact", str(art), "--checkpoint", str(ckpt),
         "--demo", "4", "--buckets", "1,8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "--buckets" in r.stderr and "manifest" in r.stderr

    # CONFIG-FREE TCP serving: the artifact embeds its answer vocab, the
    # client featurizes — the server needs only artifact + checkpoint
    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.serving import build_sample

    task_cfg = load_task_config(cfg)
    rng = np.random.RandomState(0)
    sample = build_sample(
        task_cfg,
        question_indices=np.array([101, 2054, 2003, 102, 0, 0, 0, 0]),
        question_mask=np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32),
        obj_features=rng.randn(4, 2048),
        obj_boxes=np.tile([0.1, 0.1, 0.4, 0.4, 0.09], (4, 1)),
        ocr_tokens=["stop", "7"],
        ocr_features=rng.randn(2, 2048),
        ocr_boxes=np.tile([0.5, 0.5, 0.8, 0.8, 0.09], (2, 1)),
    )
    npz_path = str(tmp_path / "req.npz")
    tokens = sample.pop("ocr_tokens")
    np.savez(npz_path, **sample, ocr_tokens=np.array(tokens))
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--artifact", str(art),
         "--checkpoint", str(ckpt), "--port", "0", "--max_wait_ms", "1"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        deadline = time.time() + 600
        while not line.strip() and time.time() < deadline:
            assert proc.poll() is None, proc.stderr.read()[-2000:]
            line = proc.stdout.readline()
        port = json.loads(line)["listening"][1]
        with socket.create_connection(("127.0.0.1", port), timeout=300) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"id": 1, "npz": npz_path}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["id"] == 1 and "error" not in resp, resp
            assert isinstance(resp["answer"], str)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_serve_auto_dp_refuses_non_dividing_tp(tmp_path):
    """Auto-dp mode must USE every device: --model_parallel 3 on 8 devices
    would silently idle two, so it exits loudly (explicit --data_parallel
    remains the escape hatch)."""
    env = _env()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    cfg = _tiny_config(tmp_path)
    r = subprocess.run(
        [sys.executable, "serve.py", "--config", cfg, "--demo", "4",
         "--model_parallel", "3"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "must divide" in r.stderr
