#!/usr/bin/env python
"""Grad-accum convergence A/B with dropout ON (jax vs jax).

``--grad_accum N`` is proven EXACTLY equal to the full-batch update at
dropout 0 (tests/test_training.py::test_grad_accum_matches_full_batch_step).
With dropout active the equivalence is distributional, not bitwise: each
microbatch draws an independent fold of the step key, so an accumulated
step sees N mask draws where the full-batch step sees one — identical
per-site keep probabilities, different stream. This tool tests the claim
that matters for training: accumulated runs converge inside the
SEED-NOISE ENVELOPE of full-batch runs.

Method (mirrors tools/convergence_ab.py, which proved the same property
torch-vs-jax): K full-batch runs with different dropout seeds define the
envelope — the worst pairwise gap between window-smoothed loss curves;
M accum=4 runs must stay within margin x envelope of the full-batch mean
curve. All runs share weights, batches, LR schedule (warmup + two decay
milestones), clip 0.25.

    python tools/ab_grad_accum_dropout.py [--steps 250] [--batch 8]
        [--accum 4] [--out /tmp/ab_grad_accum.json]

Results recorded in SCALING.md "Gradient accumulation".
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# pin to CPU before jax initializes (the axon sitecustomize registers the
# TPU plugin at interpreter start; re-exec with the pinning env, like
# tools/convergence_ab.py)
if os.environ.get("_CONV_AB_PINNED") != "1":
    env = dict(os.environ)
    env.update(_CONV_AB_PINNED="1", PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

from convergence_ab import NUM_ANSWERS, build_task, make_batches, smooth


def run_jax(task, batches, params, seed: int, grad_accum: int):
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import (
        create_train_state,
        make_train_step,
    )

    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    optimizer = make_optimizer(params, task)
    train_step = jax.jit(make_train_step(model, optimizer, grad_accum=grad_accum))
    state = create_train_state(params, optimizer)
    rng = jax.random.PRNGKey(seed)
    losses = []
    for bnp in batches:
        jb = {k: jnp.asarray(v) for k, v in bnp.items()}
        state, metrics = train_step(state, jb, rng)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--base-seeds", type=int, default=3)
    ap.add_argument("--accum-seeds", type=int, default=2)
    ap.add_argument("--window", type=int, default=25)
    # accum and full-batch runs draw INDEPENDENT streams, so the
    # accum-vs-mean gap exceeds pairwise full-batch gaps by construction
    # even with identical dynamics (same reasoning as convergence_ab.py's
    # torch-vs-jax margin); a regularization-strength bug would show as a
    # SYSTEMATIC offset >> envelope
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--out", default="/tmp/ab_grad_accum.json")
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    task = build_task(args.steps)
    print(f"building {args.steps} batches...", flush=True)
    batches = make_batches(task, args.steps, args.batch)
    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, b0)["params"]

    base_runs, accum_runs = [], []
    for s in range(args.base_seeds):
        t0 = time.time()
        base_runs.append(run_jax(task, batches, params, seed=s, grad_accum=1))
        print(f"full-batch seed {s}: final "
              f"{np.mean(base_runs[-1][-args.window:]):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    for s in range(args.accum_seeds):
        t0 = time.time()
        accum_runs.append(
            run_jax(task, batches, params, seed=100 + s,
                    grad_accum=args.accum)
        )
        print(f"accum={args.accum} seed {100 + s}: final "
              f"{np.mean(accum_runs[-1][-args.window:]):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    b_s = [smooth(r, args.window) for r in base_runs]
    a_s = [smooth(r, args.window) for r in accum_runs]
    b_mean = np.stack(b_s).mean(axis=0)
    envelope = 0.0
    for i in range(len(b_s)):
        for j in range(i + 1, len(b_s)):
            envelope = max(envelope, float(np.abs(b_s[i] - b_s[j]).max()))
    worst = max(float(np.abs(a - b_mean).max()) for a in a_s)
    a_mean = np.stack(a_s).mean(axis=0)
    result = {
        "steps": args.steps,
        "batch": args.batch,
        "accum": args.accum,
        "window": args.window,
        "fullbatch_seed_noise_envelope": envelope,
        "worst_accum_vs_fullbatch_mean": worst,
        "systematic_gap": float(np.abs(a_mean - b_mean).max()),
        "margin": args.margin,
        "bound": args.margin * envelope,
        "pass": bool(worst <= args.margin * envelope),
        "final_losses": {
            "fullbatch": [float(np.mean(r[-args.window:])) for r in base_runs],
            f"accum{args.accum}": [
                float(np.mean(r[-args.window:])) for r in accum_runs
            ],
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
