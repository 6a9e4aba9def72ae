#!/usr/bin/env python
"""Online serving CLI for SA-M4C greedy decoding.

The reference repo only scores offline splits (reference evaluator.py:52-63);
this driver exposes the same model as a long-lived service around
``sam_textvqa_tpu.serving.ServingEngine`` (dynamic batching over
pre-compiled fixed-shape buckets).

Modes:

  # synthetic load test: submit N requests from C client threads, print
  # one JSON line of latency/throughput stats
  python serve.py --config configs/train-tvqa-eval-tvqa-c3.yml \
      --checkpoint save/run1/best_model --demo 256 --concurrency 16

  # JSON-lines TCP server: one request per line
  #   {"id": 1, "npz": "/path/sample.npz"}            # arrays by SAMPLE_KEYS
  #   -> {"id": 1, "answer": "...", "latency_ms": 3.1}
  python serve.py --config ... --checkpoint ... --port 8765

The ``.npz`` file carries the per-request arrays (see
serving.engine.SAMPLE_KEYS) plus an ``ocr_tokens`` string array; produce it
with ``sam_textvqa_tpu.serving.build_sample`` + ``np.savez``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import socketserver
import threading
import time

import numpy as np

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger("serve")


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None,
                   help="task YAML; optional with --artifact --port when "
                   "the artifact embeds its answer vocab (config-free "
                   "deployment: artifact dir + checkpoint). --demo always "
                   "needs it (synthetic requests are built from the task "
                   "shapes)")
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint dir (e.g. save/run1/best_model); "
                   "random init with a loud warning when absent")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--buckets", default=None,
                   help="comma-separated pre-compiled batch sizes "
                   "(default 1,8,32; comes from the manifest with "
                   "--artifact)")
    p.add_argument("--ocr_bucket", default=None, metavar="N[,N...]",
                   help="comma-separated OCR-width ladder: batches whose "
                   "requests all fit a rung run a narrower executable "
                   "(identical answers; warmup compiles the bucket x width "
                   "grid)")
    p.add_argument("--obj_bucket", default=None, metavar="N[,N...]",
                   help="comma-separated obj-width ladder (detectron box "
                   "slots); composes with --ocr_bucket as a routing grid "
                   "(identical answers; the bigger measured lever — "
                   "SCALING.md). tools/suggest_ladder.py or the live "
                   "ladder_plan in the stats response suggest rungs")
    p.add_argument("--auto_tune", type=int, default=0, metavar="N",
                   help="re-plan the width ladders from live traffic every "
                   "N served batches and ADOPT cost-model wins >= 5%%: new "
                   "(bucket x width) cells compile on a background thread, "
                   "then routing swaps atomically (identical answers — "
                   "only service time changes); adoptions appear under "
                   "'autotune' in the stats response. 0 = off (the "
                   "ladder_plan suggestion stays advisory)")
    p.add_argument("--max_wait_ms", type=float, default=2.0)
    p.add_argument(
        "--decode_backend",
        choices=["auto", "xla", "xla_early", "xla_flat", "fused", "mega",
                 "policy"],
        default="auto",
        help="greedy decode backend; 'policy' applies the measured "
        "early-exit x bucket-size rule per batch shape (bucket-1 -> "
        "fixed xla, larger buckets -> xla_early; SCALING.md)",
    )
    p.add_argument("--demo", type=int, default=0,
                   help="submit N synthetic requests and print stats")
    p.add_argument("--demo_ocr", type=int, default=None,
                   help="demo: cap each synthetic request to this many "
                   "real OCR tokens (exercises the --ocr_bucket ladder)")
    p.add_argument("--concurrency", type=int, default=8,
                   help="demo client threads")
    p.add_argument("--rate", type=float, default=0.0,
                   help="demo: open-loop target request rate in qps "
                   "(0 = closed-loop flood; with a flood, latency "
                   "percentiles measure queue time, not service time)")
    p.add_argument("--port", type=int, default=None,
                   help="serve a JSON-lines TCP endpoint on this port "
                   "(0 binds an ephemeral port, announced on stdout)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--beam_size", type=int, default=1,
                   help="beam-search decoding with the best beam's answer "
                   "(early-exit while_loop; 1 = greedy)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel ways over a DP x TP device mesh "
                   "(SCALING.md: TP is the batch-1 latency lever); 1 = "
                   "single device / no mesh")
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="data-parallel ways (the serving THROUGHPUT "
                   "lever): each coalesced batch row-shards over N "
                   "devices with replicated weights. Default 0 = auto: "
                   "all devices left over after --model_parallel when TP "
                   "is on, else single-device. Buckets must divide by N")
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory "
                   "(default: $SAM_COMPILE_CACHE if set); engine warmup "
                   "over the bucket x width grid deserializes instead of "
                   "recompiling on every restart")
    p.add_argument("--artifact", default=None, metavar="DIR",
                   help="serve from an AOT decode artifact "
                   "(tools/export_decode.py output): the engine runs on "
                   "deserialized StableHLO cells — no model construction, "
                   "no tracing (pair with --compile_cache to also skip "
                   "the backend compile: 271 s -> 57 s warmup measured). "
                   "Buckets, width ladders, backend and beam size come "
                   "from the manifest; requires --checkpoint (weights "
                   "are a runtime argument)")
    return p.parse_args()


def _engine_from_artifact_args(args, vocab):
    """Artifact-backed serving (serving/artifact_engine.py): the manifest
    IS the routing grid, so every flag that would reshape it is refused
    loudly rather than silently ignored."""
    incompatible = [
        flag
        for flag, on in (
            ("--buckets", args.buckets),
            ("--ocr_bucket", args.ocr_bucket),
            ("--obj_bucket", args.obj_bucket),
            ("--beam_size", args.beam_size != 1),
            ("--decode_backend", args.decode_backend != "auto"),
            ("--auto_tune", args.auto_tune),
            ("--model_parallel", args.model_parallel > 1),
            ("--data_parallel", args.data_parallel),
        )
        if on
    ]
    if incompatible:
        raise SystemExit(
            f"{', '.join(incompatible)} cannot be combined with "
            "--artifact: buckets, width ladders, backend and beam size are "
            "frozen in the manifest (and auto-tune cannot compile new "
            "cells); re-export with tools/export_decode.py to change them"
        )
    if not args.checkpoint:
        raise SystemExit(
            "--artifact requires --checkpoint: the exported cells take "
            "weights as a runtime argument"
        )
    from sam_textvqa_tpu.serving.artifact_engine import engine_from_artifact
    from sam_textvqa_tpu.utils.checkpoint import restore_checkpoint

    params = restore_checkpoint(args.checkpoint)["params"]
    logger.info("restored params from %s", args.checkpoint)
    engine = engine_from_artifact(
        args.artifact, params, vocab, max_wait_ms=args.max_wait_ms
    )
    m = engine._artifact.manifest
    logger.info(
        "artifact engine %s: buckets=%s obj=%s ocr=%s backend=%s beam=%d",
        args.artifact, engine.buckets, engine.obj_ladder_widths,
        engine.ladder_widths, m.get("backend"), m.get("beam_size", 1),
    )
    return engine


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.serving import ServingEngine
    from train import build_vocab

    if args.config:
        task_cfg = load_task_config(args.config)
        vocab = build_vocab(task_cfg)
    elif args.artifact:
        # config-free deployment: the artifact embeds its answer vocab
        # (tools/export_decode.py writes answer_vocab.txt); featurization
        # is the CLIENT's job in TCP mode, so the server needs nothing else
        import os as _os

        from sam_textvqa_tpu.data.vocab import VocabDict
        from sam_textvqa_tpu.serving.artifact import VOCAB_FILE

        vocab_path = _os.path.join(args.artifact, VOCAB_FILE)
        if not _os.path.exists(vocab_path):
            raise SystemExit(
                f"{vocab_path} missing — this artifact predates embedded "
                "vocabs; pass --config"
            )
        task_cfg = None
        vocab = VocabDict(vocab_path)
        logger.info("answer vocab (%d words) loaded from the artifact",
                    len(vocab))
    else:
        raise SystemExit("--config is required without --artifact")
    if args.artifact:
        engine = _engine_from_artifact_args(args, vocab)
        t0 = time.time()
        engine.warmup()
        logger.info(
            "warmed %d deserialized bucket executables in %.1fs",
            engine.num_executables, time.time() - t0,
        )
        return task_cfg, vocab, engine
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = SAM4C(
        params_cfg=SAM4CParams(task_cfg.mmt, task_cfg.text_bert, len(vocab)),
        dtype=dtype,
    )
    if args.checkpoint:
        from sam_textvqa_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint)["params"]
        logger.info("restored params from %s", args.checkpoint)
    else:
        logger.warning(
            "no --checkpoint given — serving RANDOM weights (smoke mode)"
        )
        from sam_textvqa_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(task_cfg, 2, num_answers_vocab=len(vocab))
        sample = {
            k: jnp.asarray(v)
            for k, v in ds.get_batch(range(2)).items()
            if not k.startswith("_") and k != "question_id"
        }
        params = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(task_cfg.seed)},
                sample,
                deterministic=True,
            )["params"]
        )()
    buckets = tuple(int(b) for b in (args.buckets or "1,8,32").split(","))
    device_put = None
    tp = args.model_parallel
    n_dev = len(jax.devices())
    # default 0 = auto: soak up the leftover devices when TP is on
    # (the pre---data_parallel behavior), single device otherwise. Auto
    # mode must USE every device — a tp that doesn't divide the slice
    # would silently idle the remainder (the guard --data_parallel's
    # introduction briefly dropped); an EXPLICIT dp may target fewer
    # devices on purpose, but gets a loud warning.
    if not args.data_parallel and tp > 1 and n_dev % tp != 0:
        raise SystemExit(
            f"--model_parallel {tp} must divide the {n_dev} available "
            f"devices (otherwise devices silently idle); or pass an "
            f"explicit --data_parallel"
        )
    dp = args.data_parallel if args.data_parallel else (
        max(1, n_dev // tp) if tp > 1 else 1
    )
    if args.data_parallel and dp * tp < n_dev:
        logger.warning(
            "dp=%d x tp=%d uses %d of %d devices; the rest idle",
            dp, tp, dp * tp, n_dev,
        )
    if dp > 1 or tp > 1:
        from sam_textvqa_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        if dp * tp > n_dev:
            raise SystemExit(
                f"--data_parallel {dp} x --model_parallel {tp} needs "
                f"{dp * tp} devices; only {n_dev} available"
            )
        bad = [b for b in buckets if b % dp != 0]
        if bad:
            raise SystemExit(
                f"buckets {bad} not divisible by dp={dp}; pick --buckets "
                f"that dp divides, or change --data_parallel"
            )
        mesh = make_mesh(dp * tp, model_parallel=tp)
        params = jax.device_put(
            params, shard_params(params, mesh, tensor_parallel=tp > 1)
        )
        bs = batch_sharding(mesh)
        device_put = lambda host_batch: jax.device_put(host_batch, bs)
        logger.info("serving over mesh %s (dp=%d x tp=%d)",
                    mesh.shape, dp, tp)
    engine = ServingEngine(
        model,
        params,
        vocab,
        buckets=buckets,
        max_wait_ms=args.max_wait_ms,
        decode_backend=args.decode_backend,
        device_put=device_put,
        beam_size=args.beam_size,
        ocr_buckets=(
            [int(w) for w in args.ocr_bucket.split(",") if w]
            if args.ocr_bucket else None
        ),
        obj_buckets=(
            [int(w) for w in args.obj_bucket.split(",") if w]
            if args.obj_bucket else None
        ),
        auto_tune_every=args.auto_tune,
    )
    t0 = time.time()
    engine.warmup()
    logger.info(
        "warmed %d bucket executables in %.1fs",
        engine.num_executables, time.time() - t0,
    )
    return task_cfg, vocab, engine


def run_demo(task_cfg, vocab, engine, n: int, concurrency: int,
             rate: float = 0.0, demo_ocr=None):
    """Synthetic load test; prints one stats JSON line.

    ``rate == 0`` floods (closed loop: throughput-bound, latencies measure
    queue time); ``rate > 0`` paces submissions open-loop at the target
    qps so latency percentiles reflect service time under that load.
    ``demo_ocr`` caps each synthetic request's real OCR tokens so the
    engine's --ocr_bucket ladder actually routes (real traffic carries its
    own widths; the default synthetic pool is full-width).
    """
    from sam_textvqa_tpu.data.synthetic import SyntheticDataset
    from sam_textvqa_tpu.serving.engine import SAMPLE_KEYS

    pool_n = min(n, 256)
    ds = SyntheticDataset(task_cfg, pool_n, seed=0,
                          num_answers_vocab=len(vocab))
    batch = ds.get_batch(range(pool_n))
    samples = []
    for i in range(pool_n):
        s = {k: np.asarray(batch[k][i]) for k in SAMPLE_KEYS}
        s["ocr_tokens"] = batch["_ocr_tokens"][i]
        if demo_ocr is not None:
            mask = np.array(s["pad_ocr_mask"])
            mask[demo_ocr:] = 0.0
            s["pad_ocr_mask"] = mask
        samples.append(s)

    t0 = time.time()
    errors = []

    def client(cid):
        try:
            if rate > 0:
                # open loop: each client owns every concurrency-th slot of
                # the global arrival schedule (period 1/rate)
                futs = []
                for i in range(cid, n, concurrency):
                    time.sleep(max(0.0, t0 + i / rate - time.time()))
                    futs.append(engine.submit(samples[i % pool_n]))
                for f in futs:
                    f.result(timeout=600)
            else:
                futs = [
                    engine.submit(samples[i % pool_n])
                    for i in range(cid, n, concurrency)
                ]
                for f in futs:
                    f.result(timeout=600)
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t0
    stats = engine.stats.summary()
    stats.update(
        demo_requests=n,
        concurrency=concurrency,
        wall_s=round(elapsed, 3),
        demo_qps=round(n / elapsed, 1),
        errors=errors,
    )
    print(json.dumps(stats))
    return stats


class _LineHandler(socketserver.StreamRequestHandler):
    """One JSON request per line; the engine coalesces across connections."""

    def handle(self):
        engine = self.server.engine  # type: ignore[attr-defined]
        for raw in self.rfile:
            raw = raw.strip()
            if not raw:
                continue
            try:
                req = json.loads(raw)
                if req.get("stats"):
                    # operational introspection: {"stats": true} returns
                    # the rolling latency/throughput/occupancy summary plus
                    # suggested width-ladder rungs and batch buckets from
                    # live traffic
                    out = {"id": req.get("id"), **engine.stats.summary(),
                           "ladder_plan": engine.ladder_plan(),
                           "bucket_plan": engine.bucket_plan()}
                    self.wfile.write((json.dumps(out) + "\n").encode())
                    self.wfile.flush()
                    continue
                sample = self._load_sample(req)
                res = engine.submit(sample).result(timeout=600)
                out = {"id": req.get("id"), **res}
            except Exception as e:
                out = {"id": None, "error": repr(e)}
                try:
                    out["id"] = json.loads(raw).get("id")
                except Exception:
                    pass
            self.wfile.write((json.dumps(out) + "\n").encode())
            self.wfile.flush()

    @staticmethod
    def _load_sample(req):
        from sam_textvqa_tpu.serving.engine import SAMPLE_KEYS

        with np.load(req["npz"], allow_pickle=False) as z:
            sample = {k: z[k] for k in SAMPLE_KEYS}
            tokens = (
                [str(t) for t in z["ocr_tokens"]]
                if "ocr_tokens" in z
                else req.get("ocr_tokens", [])
            )
        sample["ocr_tokens"] = list(tokens)
        return sample


def run_server(engine, host: str, port: int):
    import signal

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((host, port), _LineHandler) as server:
        server.engine = engine  # type: ignore[attr-defined]
        bound = server.server_address
        logger.info("serving on %s:%d", bound[0], bound[1])
        print(json.dumps({"listening": [bound[0], bound[1]]}), flush=True)

        # graceful drain on SIGTERM/SIGINT: stop accepting, let in-flight
        # requests finish (engine.close(flush=True) runs in main())
        def _on_signal(signum, frame):
            logger.warning("caught signal %d; draining and exiting", signum)
            threading.Thread(target=server.shutdown, daemon=True).start()

        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, _on_signal)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        logger.info("server stopped; flushing engine")


def main():
    args = get_args()
    if not args.demo and args.port is None:
        raise SystemExit("pick a mode: --demo N or --port P")
    if args.demo and not args.config:
        raise SystemExit(
            "--demo builds synthetic requests from the task shapes and "
            "needs --config (TCP mode with --artifact does not)"
        )
    from sam_textvqa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(args.compile_cache)  # before warmup's first jit
    task_cfg, vocab, engine = build_engine(args)
    try:
        if args.demo:
            run_demo(task_cfg, vocab, engine, args.demo, args.concurrency,
                     rate=args.rate, demo_ocr=args.demo_ocr)
        if args.port is not None:
            run_server(engine, args.host, args.port)
    finally:
        engine.close()


if __name__ == "__main__":
    main()
