#!/usr/bin/env python
"""Benchmark: SA-M4C c3 training throughput (fwd+bwd+update) per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md). The comparison
constant below is an engineering estimate of the reference's training
throughput on its documented hardware (2x Titan Xp, batch 96,
sam-textvqa README:71): ~76 GFLOP/sample fwd+bwd at ~30% fp32 MFU over
24 TFLOPS -> ~90 samples/s. Replace with a measured number when the torch
reference can be run.
"""

import json
import os
import sys
import time

REFERENCE_SAMPLES_PER_SEC = 90.0  # 2x Titan Xp estimate, see docstring
# batch 96 (the reference's batch size) measured fastest on a single v5e
# chip in round 2: 1443/1427 @96 > 1399-1405 @64 > 1359 @128 (round 1's
# sweep said 64, but the mask/decode optimizations since shifted the knee)
BATCH = int(os.environ.get("BENCH_BATCH", "96"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))
WARMUP = 3
# BENCH_MODE=eval benchmarks greedy 12-step decoding (fast cached-encoder
# path) instead of training; BENCH_MODE=beam benchmarks beam search
# (BENCH_BEAM, default 5)
MODE = os.environ.get("BENCH_MODE", "train")
BEAM = int(os.environ.get("BENCH_BEAM", "5"))
# BENCH_ACCUM=N runs MODE=train with gradient accumulation (N microbatches
# per update; same update up to reassociation, ~N× less activation memory
# — SCALING.md "Gradient accumulation"); measured throughput-neutral at
# batch 96 on v5e (tools/bench_grad_accum.py)
ACCUM = int(os.environ.get("BENCH_ACCUM", "1"))
# threefry by default: the rbg hardware PRNG faulted the round-1/2 libtpu
# under sustained load; the current one survived a 300-step soak
# (SCALING.md "PRNG notes"). BENCH_PRNG=rbg selects the fast path.
PRNG = os.environ.get("BENCH_PRNG", "threefry")
# BENCH_ATTN=pallas A/Bs the fused spatial-attention kernel
# (ops/fused_attention.py) against the default XLA path
ATTN = os.environ.get("BENCH_ATTN", "xla")
# BENCH_DECODE selects the eval decode backend
# (auto | xla | xla_early | xla_flat | fused | mega); note xla_early with
# random bench params never emits EOS, so it measures the while_loop's
# WORST case (all 12 steps + dynamic-trip-count overhead) — the win shows
# on trained checkpoints / tools/bench_early_exit.py
DECODE = os.environ.get("BENCH_DECODE", "auto")
# BENCH_OCR overrides max_ocr_num for MODE=eval — measures the narrower
# executable that Evaluator.run_split(ocr_bucket=N) routes eligible
# batches through (sequence-length bucketing; answers identical, see
# SCALING.md). The full-width default is 50.
OCR_SLOTS = int(os.environ.get("BENCH_OCR", "0"))
# BENCH_OBJ: same for max_obj_num — the obj-axis rung that
# Evaluator.run_split(obj_bucket=N) routes through (full default 100);
# composes with BENCH_OCR to measure a (obj, ocr) grid cell.
OBJ_SLOTS = int(os.environ.get("BENCH_OBJ", "0"))
# BENCH_DROPOUT_REUSE=1 enables per-site-type dropout mask reuse across
# the 6 MMT layers (config.dropout_mask_reuse): +5.6% throughput, but the
# loss-curve A/B showed the correlated masks measurably weaken
# regularization (SCALING.md "dropout mask reuse"), so the headline bench
# keeps reference dropout semantics and reuse stays opt-in
DROPOUT_REUSE = os.environ.get("BENCH_DROPOUT_REUSE", "0") == "1"
# BENCH_NODROP=1 zeroes EVERY dropout rate (train-mode ceiling run: how
# much of the step is dropout RNG + mask application)
NODROP = os.environ.get("BENCH_NODROP", "0") == "1"
# BENCH_FUSED_DRAW=1 enables the fused dropout draw A/B backend
# (MMTConfig.dropout_fused_draw) — batches all MMT-layer dropout bit
# generation into a few large bernoulli calls. Identical iid Bernoulli
# semantics but measured 26% SLOWER end-to-end (1069 vs 1437 samples/s:
# the keep pages materialize in HBM; per-site draws fuse into consumers),
# so the default stays off.
FUSED_DRAW = os.environ.get("BENCH_FUSED_DRAW", "0") == "1"
V5E_BF16_PEAK_FLOPS = 197e12  # per chip (TPU v5e spec)


def _flops_per_step(compiled) -> float | None:
    """Optimized-HLO FLOP count from XLA's cost analysis, if available."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def main():
    import jax

    # honor $SAM_COMPILE_CACHE (utils/compile_cache.py): compile time is
    # outside every timed loop below, so the cache changes wall time only —
    # eval-mode decode compiles run many minutes through the tunnel
    from sam_textvqa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(None)

    if PRNG not in ("rbg", "threefry", "threefry_partitionable"):
        raise SystemExit(f"unknown BENCH_PRNG={PRNG!r}")
    if PRNG == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    elif PRNG == "threefry":
        # the non-partitionable threefry lowering packs TWO 32-bit outputs
        # per hash (the partitionable default hashes once per element) —
        # measured 1128 -> 1401 samples/s on one v5e chip, stable across
        # runs; dropout bits dominate the difference (no-drop ceiling 1719).
        # Single-chip bench: partitionability is irrelevant here.
        jax.config.update("jax_threefry_partitionable", False)
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    cfg = load_task_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs/train-tvqa-eval-tvqa-c3.yml")
    )
    if MODE == "train" and DROPOUT_REUSE and FUSED_DRAW:
        # mmt.py only builds the fused draw when mask reuse is OFF (reuse
        # already collapses the draws via CSE); measuring with both set
        # would silently label a reuse-only run as fused. Both flags are
        # inert outside MODE=train, so eval/beam runs ignore them.
        raise SystemExit(
            "BENCH_DROPOUT_REUSE=1 and BENCH_FUSED_DRAW=1 are mutually "
            "exclusive (the fused draw is inert under mask reuse)"
        )
    if MODE == "train" and (DROPOUT_REUSE or NODROP or FUSED_DRAW):
        import dataclasses

        mmt_kw = {"dropout_mask_reuse": True} if DROPOUT_REUSE else {}
        if FUSED_DRAW:
            mmt_kw["dropout_fused_draw"] = True
        tb_kw = {}
        if NODROP:
            zeros = {
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            }
            mmt_kw.update(zeros, obj_drop=0.0, ocr_drop=0.0)
            tb_kw.update(zeros)
        cfg = dataclasses.replace(
            cfg,
            mmt=dataclasses.replace(cfg.mmt, **mmt_kw),
            text_bert=dataclasses.replace(cfg.text_bert, **tb_kw),
        )
    if OCR_SLOTS or OBJ_SLOTS:
        import dataclasses

        if MODE not in ("eval", "beam"):
            raise SystemExit("BENCH_OCR/BENCH_OBJ apply to MODE=eval/beam only")
        repl = {}
        if OCR_SLOTS:
            repl["max_ocr_num"] = OCR_SLOTS
        if OBJ_SLOTS:
            repl["max_obj_num"] = OBJ_SLOTS
        cfg = dataclasses.replace(
            cfg, mmt=dataclasses.replace(cfg.mmt, **repl)
        )
    num_answers = 5000
    model = SAM4C(
        params_cfg=SAM4CParams(cfg.mmt, cfg.text_bert, num_answers),
        dtype=jnp.bfloat16,
        attention_backend=ATTN,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(cfg, BATCH, num_answers_vocab=num_answers)
        ).items()
    }
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
        )["params"]
    )()

    if MODE in ("eval", "beam"):
        import jax.numpy as jnp

        from sam_textvqa_tpu.models.fast_decode import (
            beam_search_decode_fast,
            greedy_decode_fast,
        )

        # chain iterations through a device-side dependency so the lazy
        # remote runtime cannot elide executions
        @jax.jit
        def chained(p, b, carry):
            b = dict(b)
            b["question_indices"] = b["question_indices"] + jnp.int32(
                jnp.sum(carry) * 0
            )
            if MODE == "beam":
                seqs, _ = beam_search_decode_fast(model, p, b, BEAM, 1, 2)
                return seqs[:, 0, :]
            _, pred = greedy_decode_fast(
                model, p, b, 1, backend=DECODE, eos_idx=2
            )
            return pred

        carry = jnp.zeros(
            (BATCH, cfg.mmt.num_decoding_steps), jnp.int32
        )
        step_flops = _flops_per_step(
            chained.lower(params, batch, carry).compile()
        )
        for _ in range(WARMUP):
            carry = chained(params, batch, carry)
        int(jnp.sum(carry))
        t0 = time.time()
        for _ in range(STEPS):
            carry = chained(params, batch, carry)
        int(jnp.sum(carry))
        dt = time.time() - t0
        name = (
            f"textvqa_beam{BEAM}_eval_samples_per_sec_per_chip"
            if MODE == "beam"
            else "textvqa_greedy_eval_samples_per_sec_per_chip"
        )
        out = {
            "metric": name,
            "value": round(BATCH * STEPS / dt, 1),
            "unit": "samples/s/chip",
            "vs_baseline": None,
        }
        if step_flops is not None:
            achieved = step_flops * STEPS / dt
            out["mfu"] = round(achieved / V5E_BF16_PEAK_FLOPS, 4)
            out["tflops_per_sec"] = round(achieved / 1e12, 1)
        print(json.dumps(out))
        return

    optimizer = make_optimizer(params, cfg)
    state = create_train_state(params, optimizer)
    train_step = jax.jit(
        make_train_step(model, optimizer, grad_accum=ACCUM), donate_argnums=0
    )
    rng = jax.random.PRNGKey(0)

    compiled = train_step.lower(state, batch, rng).compile()
    step_flops = _flops_per_step(compiled)

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, rng)
    # host fetch (not just block_until_ready): on lazy remote platforms a
    # bare block may not force execution; the donated-state chain makes the
    # final loss depend on every step, so one scalar fetch bounds them all
    float(metrics["loss"])

    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = train_step(state, batch, rng)
    float(metrics["loss"])
    dt = time.time() - t0

    samples_per_sec = BATCH * STEPS / dt
    out = {
        "metric": "textvqa_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
    }
    if step_flops is not None:
        achieved = step_flops * STEPS / dt
        out["mfu"] = round(achieved / V5E_BF16_PEAK_FLOPS, 4)
        out["tflops_per_sec"] = round(achieved / 1e12, 1)
        out["flops_per_sample"] = round(step_flops / BATCH)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
