#!/usr/bin/env python
"""Multi-step convergence A/B: torch reference vs our JAX stack, dropout ON.

Extends the 10-step deterministic trajectory oracle
(tests/test_reference_model_oracle.py:test_optimizer_trajectory_matches_reference)
to a 250+-step stochastic run: both stacks start from the SAME weights, see
the SAME fresh synthetic batch each step, and train with their OWN
independent dropout RNG (torch.manual_seed vs jax fold_in), mirroring the
reference's real loop (reference train.py:128-160, task_utils.py:33-57).

With dropout active the trajectories cannot match step-for-step; the claim
under test is that the JAX loss curve stays inside the SEED-NOISE ENVELOPE
measured from torch-vs-torch reruns (different dropout seeds, same
everything else). Concretely, on window-smoothed curves:

    max_t |jax(t) - mean_torch(t)|  <=  margin * max_t spread_torch(t)

where spread_torch(t) is the max pairwise |torch_i(t) - torch_j(t)|.

The model is shrunk (MMT hidden 264 / 4 layers, TextBERT 768 / 2 layers,
seq 12 question + 24 obj + 50 ocr) so a 250-step
torch run fits single-core CPU in minutes; all reference semantics
(LR warmup + decay milestones, clip 0.25, BCE loss, dropout sites) are the
production ones. Results are recorded in SCALING.md "convergence A/B".

Usage:
    python tools/convergence_ab.py [--steps 250] [--batch 8]
        [--torch-seeds 3] [--jax-seeds 2] [--out /tmp/convergence_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# pin to CPU: the axon sitecustomize registers the TPU plugin at interpreter
# startup (before this script body runs), so setting env here is too late —
# re-exec once with the pinning env like __graft_entry__.dryrun_multichip does
if os.environ.get("_CONV_AB_PINNED") != "1":
    env = dict(os.environ)
    env.update(_CONV_AB_PINNED="1", PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def build_task(steps: int):
    """Shrunk-but-faithful config: production dropout rates, warmup + two
    decay milestones inside the run."""
    import dataclasses as dc

    from sam_textvqa_tpu.config import task_config_from_dict

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {}})
    mmt = dc.replace(
        cfg.mmt,
        hidden_size=264,
        ptr_query_size=264,
        intermediate_size=512,
        layer_type_list=("n", "n", "s", "s"),
        mix_list=("none", "none", "share3", "share3"),
        max_seq_length=12,
        max_obj_num=24,
        # max_ocr_num stays 50: the reference hardcodes the legacy all-zero
        # order vectors at (B, 50, 50) (sa_m4c.py:242), so 50 is the only
        # OCR width its verbatim module can run
    )
    # text_bert hidden stays 768: the reference hardcodes
    # TEXT_BERT_HIDDEN_SIZE=768 (sa_m4c.py:72,93-103), so its projection is
    # always Linear(768 -> mmt_hidden); shrinking tb hidden would desync the
    # two stacks' module shapes. Depth/FFN/vocab carry the shrink instead.
    tb = dc.replace(
        cfg.text_bert,
        intermediate_size=512,
        num_hidden_layers=2,
        vocab_size=512,
        text_bert_init_from_bert_base=False,
    )
    return dc.replace(
        cfg,
        mmt=mmt,
        text_bert=tb,
        lr=2e-4,
        warmup_iters=max(10, steps // 12),
        warmup_factor=0.2,
        lr_decay_iters=(int(steps * 0.5), int(steps * 0.8)),
        lr_decay=0.1,
        max_grad_norm=0.25,
    )


NUM_ANSWERS = 40
TEXT_VOCAB = 512


def make_batches(task, steps: int, batch_size: int):
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch

    out = []
    for i in range(steps):
        b = device_batch(
            make_batch(task, batch_size, seed=1000 + i,
                       num_answers_vocab=NUM_ANSWERS)
        )
        b["question_indices"] = (
            b["question_indices"] % TEXT_VOCAB
        ).astype(np.int32)
        out.append(b)
    return out


def run_torch(task, batches, init_state_dict, ctx_keys, seed: int):
    """One torch training run: the reference's exact update sequence
    (Adam + LambdaLR + clip 0.25, train.py:133-144) with dropout ACTIVE,
    seeded by ``seed``."""
    from bisect import bisect

    import torch

    from reference_model_oracle import load_reference_sam4c, shim_config, torch_batch

    sa_m4c = load_reference_sam4c(NUM_ANSWERS, bos_idx=1)
    torch.manual_seed(seed)
    ref_model = sa_m4c.SAM4C(shim_config(task.mmt), shim_config(task.text_bert))
    missing, unexpected = ref_model.load_state_dict(init_state_dict, strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    groups = ref_model.get_optimizer_parameters(task.lr)
    opt = torch.optim.Adam(groups, lr=task.lr)

    def lr_update(_iter):  # reference task_utils.py:48-56
        if _iter <= task.warmup_iters:
            alpha = float(_iter) / float(task.warmup_iters)
            return task.warmup_factor * (1.0 - alpha) + alpha
        return pow(task.lr_decay, bisect(list(task.lr_decay_iters), _iter))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_update)
    ref_model.train()
    losses = []
    for bnp in batches:
        tb = torch_batch(bnp, ctx_keys)
        out = ref_model(tb)
        scores, targets = out["textvqa_scores"], tb["targets"]
        per = torch.nn.functional.binary_cross_entropy_with_logits(
            scores, targets, reduction="none"
        ) * tb["train_loss_mask"].unsqueeze(-1)
        loss = per.sum() / torch.max(
            tb["train_loss_mask"].sum(), torch.tensor(1.0)
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), task.max_grad_norm)
        opt.step()
        sched.step()
        ref_model.zero_grad()
        losses.append(float(loss.detach()))
    return losses


def run_jax(task, batches, params, seed: int):
    """One JAX training run: the production jitted train step with dropout
    ACTIVE (fresh fold_in per step), seeded by ``seed``."""
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    optimizer = make_optimizer(params, task)
    train_step = jax.jit(make_train_step(model, optimizer))
    state = create_train_state(params, optimizer)
    rng = jax.random.PRNGKey(seed)
    losses = []
    for bnp in batches:
        jb = {k: jnp.asarray(v) for k, v in bnp.items()}
        state, metrics = train_step(state, jb, rng)
        losses.append(float(metrics["loss"]))
    return losses


def smooth(x, w: int):
    x = np.asarray(x, dtype=np.float64)
    if w <= 1:
        return x
    kernel = np.ones(w) / w
    # 'valid' so the curve is fully-averaged everywhere (no edge bias)
    return np.convolve(x, kernel, mode="valid")


def analyze(torch_runs, jax_runs, window: int, margin: float):
    t_s = [smooth(r, window) for r in torch_runs]
    j_s = [smooth(r, window) for r in jax_runs]
    t_mat = np.stack(t_s)
    t_mean = t_mat.mean(axis=0)
    # seed-noise envelope: worst pairwise torch-vs-torch gap at any step
    spread = 0.0
    for i in range(len(t_s)):
        for j in range(i + 1, len(t_s)):
            spread = max(spread, float(np.abs(t_s[i] - t_s[j]).max()))
    worst_jax = max(float(np.abs(js - t_mean).max()) for js in j_s)
    # center-to-center: |mean_jax - mean_torch| (systematic offset)
    j_mean = np.stack(j_s).mean(axis=0)
    systematic = float(np.abs(j_mean - t_mean).max())
    return {
        "window": window,
        "torch_seed_noise_envelope": spread,
        "worst_jax_vs_torch_mean": worst_jax,
        "systematic_gap": systematic,
        "margin": margin,
        "bound": margin * spread,
        "pass": bool(worst_jax <= margin * spread),
        "final_losses": {
            "torch": [float(np.mean(r[-window:])) for r in torch_runs],
            "jax": [float(np.mean(r[-window:])) for r in jax_runs],
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--torch-seeds", type=int, default=3)
    ap.add_argument("--jax-seeds", type=int, default=2)
    ap.add_argument("--window", type=int, default=25)
    # jax and torch draws are INDEPENDENT streams, so E|jax - torch_mean|
    # exceeds E|torch_i - torch_j| by construction even with identical
    # dynamics; 1.5x allows that without hiding a real optimizer bug
    # (a systematic offset shows up as >> envelope)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--out", default="/tmp/convergence_ab.json")
    args = ap.parse_args()

    import time

    import jax

    from sam_textvqa_tpu.config import MATRIX_TYPE_MAP
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from reference_model_oracle import state_dict_from_flax_params

    task = build_task(args.steps)
    print(f"building {args.steps} batches...", flush=True)
    batches = make_batches(task, args.steps, args.batch)

    import jax.numpy as jnp

    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, b0)["params"]
    p_np = jax.tree.map(lambda v: np.asarray(v), params)
    sd, unmapped = state_dict_from_flax_params(
        p_np, list(task.mmt.layer_type_list), task.text_bert.num_hidden_layers
    )
    assert not unmapped, unmapped

    ctx_keys = sorted(
        {MATRIX_TYPE_MAP[m] for lt, m in
         zip(task.mmt.layer_type_list, task.mmt.mix_list) if lt in ("s", "i")}
    )

    results = {"steps": args.steps, "batch": args.batch, "torch": [], "jax": []}
    for s in range(args.torch_seeds):
        t0 = time.time()
        losses = run_torch(task, batches, sd, ctx_keys, seed=100 + s)
        print(f"torch seed {100+s}: final(raw)={losses[-1]:.4f} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        results["torch"].append(losses)
    for s in range(args.jax_seeds):
        t0 = time.time()
        losses = run_jax(task, batches, params, seed=200 + s)
        print(f"jax   seed {200+s}: final(raw)={losses[-1]:.4f} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        results["jax"].append(losses)

    summary = analyze(results["torch"], results["jax"], args.window, args.margin)
    results["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(json.dumps(summary, indent=2))
    if not summary["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
