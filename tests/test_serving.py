"""Serving engine tests: dynamic batching, bucket padding, answer parity
with the offline evaluator, error isolation, request-time preprocessing."""

import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.dataset import EpochBatcher
from sam_textvqa_tpu.data.synthetic import SyntheticDataset
from sam_textvqa_tpu.data.vocab import VocabDict
from sam_textvqa_tpu.evaluation.evaluator import Evaluator
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.serving import ServingEngine, build_sample
from sam_textvqa_tpu.serving.engine import SAMPLE_KEYS


@pytest.fixture(scope="module")
def setup():
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}}
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
    batch = {
        k: jnp.asarray(v)
        for k, v in ds.get_batch(range(2)).items()
        if not k.startswith("_") and k != "question_id"
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return task, model, vocab, ds, params


def _samples_from_dataset(ds, n):
    batch = ds.get_batch(range(n))
    out = []
    for i in range(n):
        s = {k: np.asarray(batch[k][i]) for k in SAMPLE_KEYS}
        s["ocr_tokens"] = batch["_ocr_tokens"][i]
        out.append(s)
    return out


def test_serving_answers_match_offline_eval(setup):
    task, model, vocab, ds, params = setup
    # offline reference: the evaluator's greedy split run
    ev = Evaluator(model, vocab)
    offline = ev.run_split(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches()
    )
    by_qid = {p["question_id"]: p["pred_answer"] for p in offline["predictions"]}

    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0
    )
    engine.warmup()
    with engine:
        futs = engine.submit_many(_samples_from_dataset(ds, 12))
        answers = [f.result(timeout=60) for f in futs]
    qids = np.asarray(ds.pool["question_id"][:12])
    for i, ans in enumerate(answers):
        assert ans["answer"] == by_qid[int(qids[i])], i
        assert ans["latency_ms"] >= 0.0
    s = engine.stats.summary()
    assert s["requests"] == 12
    assert s["throughput_qps"] > 0
    assert "latency_ms_p99" in s and "latency_ms_p95" in s
    # per-bucket SLO attribution: every answered request is accounted to
    # exactly one bucket, with ordered percentiles
    per = s["latency_ms_by_bucket"]
    assert set(per) <= {1, 4}
    assert sum(v["n"] for v in per.values()) == 12
    for v in per.values():
        assert 0.0 <= v["p50"] <= v["p95"] <= v["p99"]


def test_serving_ocr_bucket_ladder_same_answers(setup):
    """ocr_buckets=[2]: requests whose OCR tokens all fit 2 slots route to
    the narrower executable (ocr_width_occupancy counts it) with answers
    identical to the full-width engine's; a wide request falls back."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 12, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:12, 2:] = 0.0  # every row fits 2 slots

    def answers(engine, samples):
        engine.warmup()
        with engine:
            futs = engine.submit_many(samples)
            return [f.result(timeout=60)["answer"] for f in futs]

    samples = _samples_from_dataset(ds2, 8)
    want = answers(
        ServingEngine(model, params, vocab, buckets=(1, 4), max_wait_ms=20.0),
        samples,
    )
    narrow = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0,
        ocr_buckets=[2],
    )
    got = answers(narrow, samples)
    assert got == want
    s = narrow.stats.summary()
    assert sum(s["ocr_width_occupancy"].values()) == s["batches"]

    # a request using slot 3 must fall back to the full-width executable
    wide = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=1.0,
        ocr_buckets=[2],
    )
    wide.warmup()
    with wide:
        full = _samples_from_dataset(SyntheticDataset(
            task, 1, num_answers_vocab=len(vocab)), 1)[0]
        full["pad_ocr_mask"][:] = 1.0
        wide.submit(full).result(timeout=60)
    assert wide.stats.summary().get("ocr_width_occupancy", {}) == {}


def test_bucket_padding_and_occupancy(setup):
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=200.0
    )
    engine.warmup()
    samples = _samples_from_dataset(ds, 3)
    with engine:
        # 3 requests arrive inside one coalescing window -> one bucket-4
        # batch with 1 padded row
        futs = engine.submit_many(samples)
        for f in futs:
            f.result(timeout=60)
    assert engine.stats.batches >= 1
    assert sum(engine.stats.occupancy.values()) == engine.stats.batches
    if engine.stats.batches == 1:
        assert engine.stats.occupancy == {4: 1}
        assert engine.stats.padded_rows == 1


def test_single_request_uses_smallest_bucket(setup):
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=1.0
    )
    engine.warmup()
    with engine:
        fut = engine.submit(_samples_from_dataset(ds, 1)[0])
        fut.result(timeout=60)
    assert engine.stats.occupancy.get(1, 0) >= 1


def test_concurrent_submitters(setup):
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=2.0
    )
    engine.warmup()
    samples = _samples_from_dataset(ds, 12)
    results = {}
    errors = []

    def client(lo, hi):
        try:
            futs = [engine.submit(samples[i]) for i in range(lo, hi)]
            for i, f in zip(range(lo, hi), futs):
                results[i] = f.result(timeout=60)["answer"]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    with engine:
        threads = [
            threading.Thread(target=client, args=(lo, lo + 4))
            for lo in (0, 4, 8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert not errors
    assert len(results) == 12
    # parity vs direct single-sample serving order-independence
    ev = Evaluator(model, vocab)
    offline = ev.run_split(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches()
    )
    by_qid = {p["question_id"]: p["pred_answer"] for p in offline["predictions"]}
    qids = np.asarray(ds.pool["question_id"][:12])
    for i, ans in results.items():
        assert ans == by_qid[int(qids[i])]


def test_bad_request_fails_at_submit_not_engine(setup):
    """Malformed requests raise synchronously on the SUBMITTER's thread —
    they never enter a batch, so they cannot poison coalesced innocents."""
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1,), max_wait_ms=1.0
    )
    engine.warmup()
    good = _samples_from_dataset(ds, 1)[0]
    bad = dict(good)
    bad["pad_obj_features"] = np.zeros((3, 7), np.float32)  # wrong shape
    missing = {k: v for k, v in good.items() if k != "question_mask"}
    with engine:
        with pytest.raises(ValueError):
            engine.submit(bad)
        with pytest.raises(KeyError):
            engine.submit(missing)
        f_good = engine.submit(good)
        assert "answer" in f_good.result(timeout=60)


def test_short_ocr_token_list_is_padded(setup):
    """A request whose ocr_tokens list is shorter than max_ocr_num decodes
    without IndexError even when the model points at a padded OCR slot."""
    task, model, vocab, ds, params = setup
    good = _samples_from_dataset(ds, 1)[0]
    short = dict(good)
    short["ocr_tokens"] = list(good["ocr_tokens"][:1])
    engine = ServingEngine(model, params, vocab, buckets=(1,))
    engine.warmup()
    with engine:
        res = engine.submit(short).result(timeout=60)
    assert isinstance(res["answer"], str)


def test_batch_failure_retries_requests_isolated(setup):
    """When a BATCH fails (post-validation, e.g. a device error), the
    engine retries each member isolated instead of failing innocents that
    were merely coalesced with a poisonous request; a request whose solo
    retry fails again is blamed alone."""
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=100.0
    )
    engine.warmup()
    samples = _samples_from_dataset(ds, 3)
    orig_stack = engine._stack

    def exploding_stack(group_samples, bucket):
        if len(group_samples) > 1:
            raise RuntimeError("batch-level failure")
        return orig_stack(group_samples, bucket)

    engine._stack = exploding_stack
    with engine:
        futs = engine.submit_many(samples)
        results = [f.result(timeout=60) for f in futs]
    # every request was answered via isolated (bucket-1) retries
    assert all("answer" in r for r in results)
    # the multi-request group failed once, then >= 3 solo batches ran
    assert engine.stats.occupancy.get(1, 0) >= 3


def test_solo_retry_failure_blames_only_that_request(setup):
    """A request whose isolated retry ALSO fails gets the exception; it is
    not re-enqueued forever."""
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=100.0
    )
    engine.warmup()
    samples = _samples_from_dataset(ds, 2)

    def always_exploding_stack(group_samples, bucket):
        raise RuntimeError("persistent failure")

    engine._stack = always_exploding_stack
    with engine:
        futs = engine.submit_many(samples)
        for f in futs:
            with pytest.raises(RuntimeError, match="persistent failure"):
                f.result(timeout=60)


def test_close_flush_waits_for_inflight_batch(setup):
    """close(flush=True) must not strand a batch the batcher already popped
    from the queue (in flight) but the consumer has not answered yet."""
    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=50.0
    )
    engine.warmup()
    futs = engine.submit_many(_samples_from_dataset(ds, 4))
    # close immediately: the group may still be coalescing or in flight
    engine.close(flush=True)
    for f in futs:
        assert "answer" in f.result(timeout=5)


def test_tp_sharded_engine_matches_replicated(setup):
    """ServingEngine over a DP x TP mesh (sharded params + a data-sharded
    batch placement via the ``device_put`` hook) answers identically to the
    plain replicated engine — the online-serving analogue of
    test_sharding.test_sharded_greedy_decode_matches_single_device
    (SCALING.md: TP is the batch-1 latency lever)."""
    from sam_textvqa_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params,
    )

    task, model, vocab, ds, params = setup
    samples = _samples_from_dataset(ds, 8)

    plain = ServingEngine(model, params, vocab, buckets=(4, 8),
                          max_wait_ms=50.0)
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]

    mesh = make_mesh(8, model_parallel=2)
    params_m = jax.device_put(params, shard_params(
        params, mesh, tensor_parallel=True))
    bs = batch_sharding(mesh)
    engine = ServingEngine(
        model, params_m, vocab, buckets=(4, 8), max_wait_ms=50.0,
        device_put=lambda host_batch: jax.device_put(host_batch, bs),
    )
    engine.warmup()
    with engine:
        got = [f.result(timeout=60)["answer"]
               for f in engine.submit_many(samples)]
    assert got == want


def test_dp_sharded_engine_matches_replicated(setup):
    """ServingEngine over a pure-DP mesh (replicated params + the batch
    row-sharded over all 8 devices) answers identically to the plain
    single-device engine — the serving THROUGHPUT lever (`serve.py
    --data_parallel`): each coalesced batch's decode fans out over the
    data axis with XLA-inserted collectives, multiplying chip capacity on
    a pod slice without any engine-code changes."""
    from sam_textvqa_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params,
    )

    task, model, vocab, ds, params = setup
    samples = _samples_from_dataset(ds, 8)

    plain = ServingEngine(model, params, vocab, buckets=(8,),
                          max_wait_ms=50.0)
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]

    mesh = make_mesh(8, model_parallel=1)  # dp=8, no TP
    params_m = jax.device_put(params, shard_params(
        params, mesh, tensor_parallel=False))
    bs = batch_sharding(mesh)
    engine = ServingEngine(
        model, params_m, vocab, buckets=(8,), max_wait_ms=50.0,
        device_put=lambda host_batch: jax.device_put(host_batch, bs),
    )
    engine.warmup()
    with engine:
        got = [f.result(timeout=60)["answer"]
               for f in engine.submit_many(samples)]
    assert got == want


def test_submit_after_close_raises(setup):
    task, model, vocab, ds, params = setup
    engine = ServingEngine(model, params, vocab, buckets=(1,))
    engine.start()
    engine.close()
    with pytest.raises(RuntimeError):
        engine.submit(_samples_from_dataset(ds, 1)[0])


def test_run_demo_paced_open_loop(setup, capsys):
    """serve.run_demo with --rate paces submissions open-loop and reports
    service-time stats alongside latency percentiles."""
    import json
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import serve

    task, model, vocab, ds, params = setup
    engine = ServingEngine(model, params, vocab, buckets=(1, 4),
                           max_wait_ms=2.0)
    engine.warmup()
    with engine:
        stats = serve.run_demo(task, vocab, engine, n=16, concurrency=4,
                               rate=200.0)
    assert stats["requests"] == 16
    assert stats["errors"] == []
    assert stats["service_ms_per_batch_p50"] > 0
    # open loop at 200 q/s: 16 requests take >= 75 ms of schedule
    assert stats["wall_s"] >= 16 / 200.0 * 0.9
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["demo_requests"] == 16


def test_run_demo_ocr_cap_routes_ladder(setup, capsys):
    """serve.run_demo(demo_ocr=2) caps synthetic requests' real OCR tokens,
    so an engine with ocr_buckets routes every batch to the narrow rung."""
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import serve

    task, model, vocab, ds, params = setup
    engine = ServingEngine(model, params, vocab, buckets=(1, 4),
                           max_wait_ms=2.0, ocr_buckets=[2])
    engine.warmup()
    with engine:
        stats = serve.run_demo(task, vocab, engine, n=8, concurrency=4,
                               demo_ocr=2)
    assert stats["requests"] == 8
    assert stats["errors"] == []
    assert sum(stats["ocr_width_occupancy"].values()) == stats["batches"]
    capsys.readouterr()


def test_build_sample_schema(setup):
    task, model, vocab, ds, params = setup
    mmt = task.mmt
    rng = np.random.RandomState(0)
    n_obj, n_ocr = 5, 3
    sample = build_sample(
        task,
        question_indices=np.array([101, 2054, 2003, 102] + [0] * 4),
        question_mask=np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32),
        obj_features=rng.randn(n_obj, 2048),
        obj_boxes=np.tile([0.1, 0.1, 0.4, 0.4, 0.09], (n_obj, 1)),
        ocr_tokens=["Stop", "exit", "7"],
        ocr_features=rng.randn(n_ocr, 2048),
        ocr_boxes=np.tile([0.5, 0.5, 0.8, 0.8, 0.09], (n_ocr, 1)),
    )
    for k in SAMPLE_KEYS:
        assert k in sample, k
    assert sample["pad_obj_features"].shape == (mmt.max_obj_num, 2048)
    assert sample["ocr_phoc"].shape == (mmt.max_ocr_num, 604)
    assert sample["spatial_classes"].shape == (
        mmt.max_obj_num + mmt.max_ocr_num,
    ) * 2
    # diagonal of valid rows is the self-relation class 12
    # (reference spatial_utils.py:206-209)
    assert sample["spatial_classes"][0, 0] == 12
    assert sample["ocr_tokens"][:3] == ["stop", "exit", "7"]
    # cleaned/padded to max_ocr_num
    assert len(sample["ocr_tokens"]) == mmt.max_ocr_num
    # the sample is servable end-to-end
    engine = ServingEngine(model, params, vocab, buckets=(1,))
    engine.warmup()
    with engine:
        res = engine.submit(sample).result(timeout=60)
    assert isinstance(res["answer"], str)


def test_tcp_endpoint_end_to_end(setup, tmp_path):
    """serve.py's JSON-lines TCP server over a real socket: good requests
    answer with the engine's result, malformed requests return an error
    line with the request id, and the engine survives both."""
    import json
    import socket
    import socketserver
    import sys

    sys.path.insert(0, "/root/repo")
    from serve import _LineHandler

    task, model, vocab, ds, params = setup
    engine = ServingEngine(model, params, vocab, buckets=(1,),
                           max_wait_ms=1.0)
    engine.warmup()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    server = Server(("127.0.0.1", 0), _LineHandler)
    server.engine = engine
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sample = _samples_from_dataset(ds, 1)[0]
        npz = tmp_path / "req.npz"
        np.savez(npz, **{k: sample[k] for k in SAMPLE_KEYS},
                 ocr_tokens=np.asarray(sample["ocr_tokens"], dtype="U32"))

        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"id": 7, "npz": str(npz)}) + "\n")
            f.flush()
            res = json.loads(f.readline())
            assert res["id"] == 7 and isinstance(res["answer"], str)
            # malformed: missing npz path
            f.write(json.dumps({"id": 8, "npz": str(tmp_path / "nope.npz")})
                    + "\n")
            f.flush()
            err = json.loads(f.readline())
            assert err["id"] == 8 and "error" in err
            # the engine still serves after the bad request
            f.write(json.dumps({"id": 9, "npz": str(npz)}) + "\n")
            f.flush()
            res2 = json.loads(f.readline())
            assert res2["id"] == 9 and res2["answer"] == res["answer"]
            # operational stats over the same connection
            f.write(json.dumps({"id": 10, "stats": True}) + "\n")
            f.flush()
            st = json.loads(f.readline())
            assert st["id"] == 10 and st["requests"] >= 2
            assert "latency_ms_p50" in st
    finally:
        server.shutdown()
        server.server_close()
        engine.close()


def test_fresh_poison_cannot_fail_waiting_solo_retry(setup):
    """A solo retry popped while a FRESH poisonous request is coalescing
    must not ride in that batch (it would be blamed on the spot for the
    stranger's poison): the batcher carries it to its own next batch."""
    from sam_textvqa_tpu.serving.engine import _Pending

    task, model, vocab, ds, params = setup
    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=200.0
    )
    engine.warmup()
    good = engine._validate(_samples_from_dataset(ds, 1)[0])
    poison = dict(good)
    poison["ocr_tokens"] = ["POISON"] + list(good["ocr_tokens"])[1:]
    orig_stack = engine._stack

    def stack(group_samples, bucket):
        if any(g["ocr_tokens"][0] == "POISON" for g in group_samples):
            raise RuntimeError("poison")
        return orig_stack(group_samples, bucket)

    engine._stack = stack
    # deterministic ordering: the non-solo poison is popped first, the solo
    # good arrives during its coalescing window
    p_poison = _Pending(poison)
    p_good = _Pending(good)
    p_good.solo = True
    engine._queue.put(p_poison)
    engine._queue.put(p_good)
    engine.start()
    try:
        assert "answer" in p_good.result(timeout=60)
        with pytest.raises(RuntimeError, match="poison"):
            p_poison.result(timeout=60)
    finally:
        engine.close(flush=False)


def test_submit_normalizes_dtypes(setup):
    """Loosely-typed requests (float64 features / int64 indices, e.g. built
    from JSON) are normalized to the schema dtypes at submit — same answer
    as the canonical request, one jit signature, no poisoned batch."""
    task, model, vocab, ds, params = setup
    s = _samples_from_dataset(ds, 1)[0]
    loose = {}
    for k, v in s.items():
        if k == "ocr_tokens":
            loose[k] = v
        elif v.dtype.kind == "f":
            loose[k] = np.asarray(v, np.float64)
        else:
            loose[k] = np.asarray(v, np.int64)
    engine = ServingEngine(model, params, vocab, buckets=(1,))
    engine.warmup()
    with engine:
        want = engine.submit(s).result(timeout=60)["answer"]
        got = engine.submit(loose).result(timeout=60)["answer"]
    assert got == want


def test_submit_requires_ocr_tokens(setup):
    """Omitting ocr_tokens raises at submit instead of silently decoding
    OCR-pointer predictions to the literal '<pad>'."""
    task, model, vocab, ds, params = setup
    s = {k: v for k, v in _samples_from_dataset(ds, 1)[0].items()
         if k != "ocr_tokens"}
    engine = ServingEngine(model, params, vocab, buckets=(1,))
    with engine:
        with pytest.raises(KeyError, match="ocr_tokens"):
            engine.submit(s)


def test_beam_serving_matches_offline_beam_eval(setup):
    """ServingEngine(beam_size=3) must answer with the same best-beam
    answer the offline beam evaluator reports for every question."""
    task, model, vocab, ds, params = setup
    offline = Evaluator(model, vocab).run_split_beam(
        params, EpochBatcher(ds, 4, shuffle=False).epoch_batches(), 3
    )
    by_qid = {p["question_id"]: p["pred_answer"]
              for p in offline["predictions"]}

    engine = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0, beam_size=3
    )
    engine.warmup()
    with engine:
        futs = engine.submit_many(_samples_from_dataset(ds, 12))
        answers = [f.result(timeout=120) for f in futs]
    qids = np.asarray(ds.pool["question_id"][:12])
    for i, ans in enumerate(answers):
        assert ans["answer"] == by_qid[int(qids[i])], i


def test_engine_xla_early_backend_matches_default(setup):
    """ServingEngine(decode_backend="xla_early") — the backend's target use
    case — answers identically to the default engine."""
    task, model, vocab, ds, params = setup
    samples = _samples_from_dataset(ds, 6)
    plain = ServingEngine(model, params, vocab, buckets=(2,), max_wait_ms=20.0)
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]
    early = ServingEngine(model, params, vocab, buckets=(2,),
                          max_wait_ms=20.0, decode_backend="xla_early")
    early.warmup()
    with early:
        got = [f.result(timeout=60)["answer"]
               for f in early.submit_many(samples)]
    assert got == want


def test_engine_policy_backend_routes_by_bucket(setup, monkeypatch):
    """decode_backend="policy" applies the measured operator rule per batch
    shape (SCALING.md "Serving latency SLOs"): bucket-1 batches trace the
    fixed-step "xla" executable, larger buckets trace "xla_early" — and the
    answers match the default engine exactly (early exit is bit-identical
    by contract)."""
    task, model, vocab, ds, params = setup
    samples = _samples_from_dataset(ds, 5)

    plain = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0
    )
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]

    import sam_textvqa_tpu.models.fast_decode as fd

    traced = []  # (backend, rows) at trace time — one entry per executable
    real = fd.greedy_decode_fast

    def spy(model_, params_, batch, bos, backend="auto", eos_idx=None):
        traced.append((backend, batch["question_indices"].shape[0]))
        return real(model_, params_, batch, bos,
                    backend=backend, eos_idx=eos_idx)

    monkeypatch.setattr(fd, "greedy_decode_fast", spy)
    policy = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0,
        decode_backend="policy",
    )
    policy.warmup()
    with policy:
        # one solo request (bucket 1) + a coalesced group (bucket 4)
        first = policy.submit(samples[0]).result(timeout=60)["answer"]
        rest = [f.result(timeout=60)["answer"]
                for f in policy.submit_many(samples[1:])]
    assert [first] + rest == want

    by_backend = {}
    for backend, rows in traced:
        by_backend.setdefault(backend, set()).add(rows)
    assert by_backend == {"xla": {1}, "xla_early": {4}}, traced


def test_policy_backend_composes_with_ocr_ladder(setup):
    """decode_backend="policy" + ocr_buckets: every ladder rung's executable
    is itself policy-dispatched (narrow fns come from the same _make_greedy),
    and answers match the plain full-width engine on ladder-eligible
    traffic."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 8, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:8, 2:] = 0.0  # every row fits rung 2
    samples = _samples_from_dataset(ds2, 6)

    plain = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0
    )
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]

    grid = ServingEngine(
        model, params, vocab, buckets=(1, 4), max_wait_ms=20.0,
        decode_backend="policy", ocr_buckets=[2],
    )
    grid.warmup()
    with grid:
        first = grid.submit(samples[0]).result(timeout=60)["answer"]
        rest = [f.result(timeout=60)["answer"]
                for f in grid.submit_many(samples[1:])]
    assert [first] + rest == want
    # every batch rode the rung-2 executable (policy-dispatched inside)
    s = grid.stats.summary()
    assert sum(s["ocr_width_occupancy"].values()) == s["batches"]


def test_serving_obj_bucket_ladder_same_answers(setup):
    """obj_buckets=[3]: requests whose real obj boxes all fit 3 slots route
    to the narrower executable with answers identical to the full-width
    engine's (the obj axis is the bigger measured lever — SCALING.md)."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 10, num_answers_vocab=len(vocab))
    ds2.pool["pad_obj_mask"][:10, 3:] = 0.0  # every row fits 3 obj slots
    samples = _samples_from_dataset(ds2, 6)

    plain = ServingEngine(model, params, vocab, buckets=(1, 4),
                          max_wait_ms=20.0)
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]
    narrow = ServingEngine(model, params, vocab, buckets=(1, 4),
                           max_wait_ms=20.0, obj_buckets=[3])
    narrow.warmup()
    with narrow:
        got = [f.result(timeout=60)["answer"]
               for f in narrow.submit_many(samples)]
    assert got == want
    s = narrow.stats.summary()
    assert sum(s["obj_width_occupancy"].values()) == s["batches"]


def test_serving_grid_routing_same_answers(setup):
    """obj x ocr grid: requests fitting both rungs route to the (obj, ocr)
    cell — both occupancy maps count every batch — with identical answers."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 10, num_answers_vocab=len(vocab))
    ds2.pool["pad_obj_mask"][:10, 3:] = 0.0
    ds2.pool["pad_ocr_mask"][:10, 2:] = 0.0
    samples = _samples_from_dataset(ds2, 6)

    plain = ServingEngine(model, params, vocab, buckets=(2,),
                          max_wait_ms=20.0)
    plain.warmup()
    with plain:
        want = [f.result(timeout=60)["answer"]
                for f in plain.submit_many(samples)]
    grid = ServingEngine(model, params, vocab, buckets=(2,),
                         max_wait_ms=20.0, obj_buckets=[3], ocr_buckets=[2])
    assert grid.num_executables == 4  # 1 bucket x (obj 3|full) x (ocr 2|full)
    grid.warmup()
    with grid:
        got = [f.result(timeout=60)["answer"]
               for f in grid.submit_many(samples)]
    assert got == want
    s = grid.stats.summary()
    assert sum(s["obj_width_occupancy"].values()) == s["batches"]
    assert sum(s["ocr_width_occupancy"].values()) == s["batches"]


def test_ladder_plan_suggests_from_live_traffic(setup):
    """A plain engine (no ladders) still histograms per-sample needed
    widths; ladder_plan() turns them into suggested rungs lying on observed
    widths with speedup estimates >= 1."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 8, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:4, 2:] = 0.0  # half the traffic is narrow
    samples = _samples_from_dataset(ds2, 8)

    engine = ServingEngine(model, params, vocab, buckets=(4,),
                           max_wait_ms=20.0)
    engine.warmup()
    with engine:
        [f.result(timeout=60) for f in engine.submit_many(samples)]

    plan = engine.ladder_plan(max_rungs=2)
    assert set(plan) == {"ocr", "obj"}
    ocr = plan["ocr"]
    assert sum(ocr["needed_width_histogram"].values()) == 8
    assert ocr["full_width"] == task.mmt.max_ocr_num
    observed = set(ocr["needed_width_histogram"])
    for lad in ocr["ladders"]:
        assert set(lad["rungs"]) <= observed
        assert lad["expected_speedup"] >= 1.0


def test_bucket_plan_from_live_traffic(setup):
    """bucket_plan(): the engine histograms true coalesced group sizes and
    fits t(B) = a + b*B to its own per-bucket service times; once two
    distinct buckets have been measured it suggests batch buckets lying on
    observed group sizes (first-order estimate; serving/ladder.py)."""
    task, model, vocab, ds, params = setup
    samples = _samples_from_dataset(ds, 9)

    engine = ServingEngine(model, params, vocab, buckets=(1, 4),
                           max_wait_ms=50.0)
    engine.warmup()
    with engine:
        assert engine.bucket_plan() is None  # nothing observed yet
        # a lone request rides bucket 1...
        engine.submit(samples[0]).result(timeout=60)
        plan1 = engine.bucket_plan()
        assert plan1["top_bucket"] == 1 and "reason" in plan1
        # ...then coalesced groups ride bucket 4
        [f.result(timeout=60) for f in engine.submit_many(samples[1:])]

    s = engine.stats.summary()
    plan = engine.bucket_plan(max_buckets=2)
    assert sum(plan["group_size_histogram"].values()) == s["batches"]
    observed = set(plan["group_size_histogram"])
    if "ladders" in plan:  # two distinct buckets measured (the usual case)
        assert plan["service_fit_ms"]["per_row"] > 0
        for lad in plan["ladders"]:
            assert lad["buckets"][-1] == plan["top_bucket"]
            assert set(lad["buckets"]) <= observed
            assert lad["expected_speedup"] >= 1.0
    else:  # every group coalesced to the same bucket: fit impossible
        assert "reason" in plan


def test_auto_tune_adopts_ladder_same_answers(setup):
    """auto_tune_every: under narrow traffic the engine re-plans its width
    ladders from live histograms, compiles the new cells on a background
    thread, and swaps routing atomically. Answers before/during/after the
    swap are identical to an untuned engine's; the adoption is logged to
    stats (and the TCP stats response); later batches route to the rungs."""
    import time as _time

    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 16, num_answers_vocab=len(vocab))
    ds2.pool["pad_obj_mask"][:, 3:] = 0.0  # every row: 3 obj boxes
    ds2.pool["pad_ocr_mask"][:, 2:] = 0.0  # every row: 2 OCR slots
    samples = _samples_from_dataset(ds2, 16)

    def answers(engine, batch_of):
        with engine:
            out = []
            for wave in batch_of:
                futs = engine.submit_many(wave)
                out.extend(f.result(timeout=60)["answer"] for f in futs)
                if getattr(engine, "_auto_tune_every", 0):
                    # let the tuner finish so the SECOND wave rides the
                    # adopted grid (adoption itself is what's under test;
                    # answer parity must hold regardless of timing)
                    deadline = _time.monotonic() + 60
                    while _time.monotonic() < deadline:
                        with engine.stats.lock:
                            if engine.stats.autotune:
                                break
                        if (engine._tuner is not None
                                and not engine._tuner.is_alive()):
                            break
                        _time.sleep(0.01)
            return out

    waves = [samples[:8], samples[8:]]
    base = ServingEngine(model, params, vocab, buckets=(1, 4),
                         max_wait_ms=20.0)
    base.warmup()
    want = answers(base, waves)

    tuned = ServingEngine(model, params, vocab, buckets=(1, 4),
                          max_wait_ms=20.0, auto_tune_every=1)
    tuned.warmup()
    got = answers(tuned, waves)
    assert got == want

    s = tuned.stats.summary()
    events = s.get("autotune", [])
    assert events, "tuner never adopted despite uniformly narrow traffic"
    ev = events[0]
    # rungs lie on the observed needed widths (3 obj boxes, 2 OCR slots)
    assert ev["obj_ladder"] == [3] and ev["ocr_ladder"] == [2]
    assert ev["new_cells"] >= 1 and ev["warmup_s"] >= 0.0
    assert ev["expected_speedup"]["obj"] >= 1.05
    assert tuned.obj_ladder_widths == [3] and tuned.ladder_widths == [2]
    # post-adoption batches actually routed narrow
    assert s.get("obj_width_occupancy", {}).get(3, 0) >= 1
    assert s.get("ocr_width_occupancy", {}).get(2, 0) >= 1


def test_auto_tune_respects_executable_budget(setup):
    """max_executables below any 1-rung grid: the tuner must never adopt
    (and serving must keep answering) even when the plan clears the
    speedup bar."""
    task, model, vocab, ds, params = setup
    ds2 = SyntheticDataset(task, 8, num_answers_vocab=len(vocab))
    ds2.pool["pad_ocr_mask"][:, 2:] = 0.0
    samples = _samples_from_dataset(ds2, 8)

    base = ServingEngine(model, params, vocab, buckets=(1, 4),
                         max_wait_ms=20.0)
    base.warmup()
    with base:
        want = [f.result(timeout=60)["answer"]
                for f in base.submit_many(samples)]

    # 2 buckets x (1+1 rung) x 1 = 4 executables > budget 3 -> no adoption
    capped = ServingEngine(model, params, vocab, buckets=(1, 4),
                           max_wait_ms=20.0, auto_tune_every=1,
                           max_executables=3)
    capped.warmup()
    with capped:
        got = [f.result(timeout=60)["answer"]
               for f in capped.submit_many(samples)]
    assert got == want
    assert "autotune" not in capped.stats.summary()
    assert capped.ladder_widths == [] and capped.obj_ladder_widths == []
