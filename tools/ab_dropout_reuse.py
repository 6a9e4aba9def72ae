#!/usr/bin/env python
"""A/B: dropout mask reuse (config.dropout_mask_reuse) loss-curve impact.

Trains the full-size c3 model on synthetic data twice per seed — fresh
per-layer dropout masks (reference semantics) vs per-site-type masks reused
across the 6 MMT layers — and reports the loss trajectories. The deviation
between variants is compared against the seed-to-seed noise floor: reuse is
acceptable if |on - off| is within the spread |seed0 - seed1| of the
unchanged variant.

Usage:  python tools/ab_dropout_reuse.py [steps] [batch]
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 96


def run(reuse: bool, seed: int, rng_shift: int = 0):
    """One training run. ``seed`` fixes dataset + init + batch order;
    ``rng_shift`` offsets only the dropout key — the clean noise floor for
    the reuse comparison is (reuse=False, rng_shift=1) vs
    (reuse=False, rng_shift=0): identical everything except which dropout
    masks were drawn."""
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.dataset import EpochBatcher
    from sam_textvqa_tpu.data.synthetic import SyntheticDataset
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    cfg = load_task_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs/train-tvqa-eval-tvqa-c3.yml")
    )
    cfg = dataclasses.replace(
        cfg, mmt=dataclasses.replace(cfg.mmt, dropout_mask_reuse=reuse),
        warmup_iters=50,
    )
    num_answers = 5000
    model = SAM4C(
        params_cfg=SAM4CParams(cfg.mmt, cfg.text_bert, num_answers),
        dtype=jnp.bfloat16,
    )
    ds = SyntheticDataset(cfg, 4 * BATCH, seed=seed, num_answers_vocab=num_answers)
    batcher = EpochBatcher(ds, BATCH, seed=seed)

    sample = None
    losses = []
    params = None
    state = None
    train_step = None
    optimizer = None
    rng = None
    step = 0
    import numpy as np

    epoch = 0
    while step < STEPS:
        # pin the epoch explicitly: epoch_batches() auto-increments only
        # when the generator is exhausted (not when the step cap abandons
        # it mid-epoch), so relying on the attribute is boundary-sensitive
        batcher.epoch = epoch
        epoch += 1
        for batch in batcher.epoch_batches():
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if not k.startswith("_") and k != "question_id"}
            if params is None:
                import jax

                params = jax.jit(
                    lambda b: model.init(
                        {"params": jax.random.PRNGKey(seed)}, b,
                        deterministic=True,
                    )["params"]
                )(dev)
                optimizer = make_optimizer(params, cfg)
                state = create_train_state(params, optimizer)
                train_step = jax.jit(make_train_step(model, optimizer))
                rng = jax.random.PRNGKey(seed * 7919 + 104729 * rng_shift)
            state, metrics = train_step(state, dev, rng)
            losses.append(metrics["loss"])
            step += 1
            if step >= STEPS:
                break
    return [float(x) for x in losses]


def main():
    out = {}
    # (key, reuse, seed, rng_shift): seed 0 fixes data/init/batch order;
    # the noise floor is fresh-dropout with a different dropout key only.
    runs = [
        ("fresh", False, 0, 0),
        ("reuse", True, 0, 0),
        ("fresh_rngshift", False, 0, 1),
        ("fresh_seed1", False, 1, 0),
        ("reuse_seed1", True, 1, 0),
    ]
    for key, reuse, seed, shift in runs:
        out[key] = run(reuse, seed, shift)
        print(f"{key}: final50_mean="
              f"{sum(out[key][-50:]) / 50:.4f}", flush=True)

    import numpy as np

    def tail(k):
        return np.asarray(out[k][-50:])

    dev_variant = float(np.mean(np.abs(tail("reuse") - tail("fresh"))))
    dev_noise = float(np.mean(np.abs(tail("fresh_rngshift") - tail("fresh"))))
    summary = {
        "steps": STEPS,
        "batch": BATCH,
        "final50_mean": {k: float(np.mean(tail(k))) for k in out},
        "mean_abs_dev_reuse_vs_fresh": dev_variant,
        "noise_floor_dropoutkey_only": dev_noise,
        "reuse_within_noise": dev_variant <= 1.5 * dev_noise,
    }
    print(json.dumps(summary))
    with open("/tmp/ab_dropout_reuse.json", "w") as f:
        json.dump({"summary": summary, "curves": out}, f)


if __name__ == "__main__":
    main()
