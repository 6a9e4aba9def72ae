#!/usr/bin/env python
"""Measure gradient accumulation's activation-memory claim and its cost.

``--grad_accum N`` promises ~N× less activation memory for the same
effective batch (training/step.py). The axon runtime exposes no live
``memory_stats``, so the memory number comes from XLA's own compile-time
allocation analysis (``compiled.memory_analysis()``): ``temp`` is the
executable's scratch arena — dominated by the saved activations of the
fwd+bwd step — while ``argument`` (params + batch + opt state) and
``output`` are accumulation-invariant by construction. Step time is then
measured the same way bench.py does (chained device-side dependency so
the lazy remote runtime cannot elide executions).

    python tools/bench_grad_accum.py [--batch 96] [--accums 1,2,4,8] [--steps 10]

Results recorded in SCALING.md "Gradient accumulation".
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--accums", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--config", default="configs/train-tvqa-eval-tvqa-c3.yml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # match bench.py's PRNG setup (the measured-fastest lowering)
    jax.config.update("jax_threefry_partitionable", False)

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import (
        create_train_state,
        make_train_step,
    )

    cfg = load_task_config(args.config)
    num_answers = 5000
    model = SAM4C(
        params_cfg=SAM4CParams(cfg.mmt, cfg.text_bert, num_answers),
        dtype=jnp.bfloat16,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(cfg, args.batch, num_answers_vocab=num_answers)
        ).items()
    }
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
        )["params"]
    )()
    optimizer = make_optimizer(params, cfg)
    state = create_train_state(params, optimizer)
    rng = jax.random.PRNGKey(0)

    rows = []
    for accum in (int(a) for a in args.accums.split(",")):
        step = jax.jit(make_train_step(model, optimizer, grad_accum=accum))
        lowered = step.lower(state, batch, rng)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        temp = generated = argument = None
        if mem is not None:
            temp = int(getattr(mem, "temp_size_in_bytes", 0))
            generated = int(getattr(mem, "generated_code_size_in_bytes", 0))
            argument = int(getattr(mem, "argument_size_in_bytes", 0))

        # timed loop: chain steps through the carried state so the remote
        # runtime executes every iteration
        s = state
        s, m = compiled(s, batch, rng)  # warmup/settle
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, m = compiled(s, batch, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        rows.append(
            {
                "grad_accum": accum,
                "temp_bytes": temp,
                "argument_bytes": argument,
                "generated_code_bytes": generated,
                "step_ms": round(dt * 1e3, 2),
                "samples_per_sec": round(args.batch / dt, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]
    for r in rows[1:]:
        if base["temp_bytes"] and r["temp_bytes"]:
            r["temp_ratio_vs_accum1"] = round(
                base["temp_bytes"] / r["temp_bytes"], 2
            )
    print(json.dumps({"batch": args.batch, "rows": rows}))


if __name__ == "__main__":
    main()
