#!/usr/bin/env python
"""A/B: dropout keep-mask draw width vs train throughput (VERDICT r3 #4).

The production draw is `jax.random.bernoulli` = threefry u32 bits ->
bitcast to f32 in [1,2) -> subtract 1 -> compare < p (granularity 2^-24).
Variants measured here replace every dropout draw in the step (our
explicit sites AND flax's nn.Dropout, both of which resolve
`jax.random.bernoulli` at call time) with:

  * u32cmp — u32 bits < round(p * 2^32): SAME number of threefry hashes
    and 32-bit lanes, but skips the bits->float conversion chain
    (bitcast/and/or/sub per element); keep probability granularity 2^-32,
    i.e. strictly TIGHTER than stock bernoulli's 2^-24.
  * u16 / u8 — narrower bit draws (half / quarter the threefry hashing)
    with integer threshold compare; granularity 2^-16 / 2^-8 (at p=0.9:
    keep=0.89996 / 0.89844 — semantics-changing, opt-in territory).

u16/u8 were measured SLOWER in round 2 (sub-word relayouts; the u8 unpack
also faulted that libtpu). The current libtpu survived rbg soaks that the
old one faulted on, so they are re-measured here alongside the new u32cmp
lever. Results recorded in SCALING.md ("dropout draw width A/B").

Usage: python tools/ab_dropout_bits.py [--steps 30] [--batch 96]
       [--variants base,u32cmp,u16,u8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_bernoulli(width: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}[width]
    npdt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[width]
    orig = jax.random.bernoulli

    def bernoulli(key, p=0.5, shape=None):
        if not isinstance(p, (int, float)):
            return orig(key, p, shape)  # traced p: out of scope here
        if shape is None:
            shape = ()
        thr = min(int(round(float(p) * (1 << width))), (1 << width) - 1)
        bits = jax.random.bits(key, shape, dt)
        return bits < npdt(thr)

    return bernoulli


def build_and_time(steps: int, batch: int, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    cfg = load_task_config(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml"))
    num_answers = 5000
    model = SAM4C(
        params_cfg=SAM4CParams(cfg.mmt, cfg.text_bert, num_answers),
        dtype=jnp.bfloat16,
    )
    b = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(cfg, batch, num_answers_vocab=num_answers)
        ).items()
    }
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, b,
                           deterministic=True)["params"]
    )()
    optimizer = make_optimizer(params, cfg)
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(warmup):
        state, metrics = step(state, b, rng)
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, b, rng)
    float(metrics["loss"])
    dt = time.time() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--variants", default="base,u32cmp,u16,u8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_threefry_partitionable", False)

    widths = {"u32cmp": 32, "u16": 16, "u8": 8}
    orig = jax.random.bernoulli
    results = {}
    for variant in args.variants.split(","):
        variant = variant.strip()
        if variant == "base":
            jax.random.bernoulli = orig
        else:
            jax.random.bernoulli = make_bernoulli(widths[variant])
        try:
            sps = build_and_time(args.steps, args.batch)
        except Exception as e:
            results[variant] = {"error": repr(e)[:200]}
            print(json.dumps({"variant": variant, "error": repr(e)[:200]}),
                  flush=True)
            continue
        finally:
            jax.random.bernoulli = orig
        results[variant] = {"samples_per_sec": round(sps, 1)}
        print(json.dumps({"variant": variant,
                          "samples_per_sec": round(sps, 1),
                          "batch": args.batch, "steps": args.steps}),
              flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
