#!/usr/bin/env python
"""Capture a jax.profiler device trace of the production train step and
print an op-level time breakdown (dropout RNG vs everything else).

VERDICT r3 "what's weak" #1: the 1448 -> 1832 samples/s dropout gap was
measured end-to-end but never SHOWN at the op level. This script:

1. AOT-compiles the exact bench.py train step (threefry, bf16, batch 96)
   and keeps the optimized HLO text, so trace op names and HLO fusion
   names come from the SAME executable;
2. runs `--steps` traced steps under `utils.profiling.trace` and parses
   the TensorBoard trace-viewer export (`*.trace.json.gz`), keeping only
   the device's "XLA Ops" lane (module-level and step-marker lanes would
   double-count) and normalizing by the number of module executions seen
   on the "XLA Modules" lane;
3. buckets device-op time by the trace's `hlo_category` AND attributes
   fusions to the dropout-RNG chain by scanning their fused-computation
   bodies in the HLO for threefry ops (xor / shift-left /
   shift-right-logical on u32, or rng-bit-generator);
4. prints one JSON line with ms/step per bucket and the top ops.

Run twice (with and without --nodrop) and diff the category tables to see
where the dropout gap goes; results are recorded in SCALING.md ("Where
the dropout MFU gap goes").

Usage: python tools/profile_train_step.py [--nodrop] [--steps 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(nodrop: bool, batch: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_threefry_partitionable", False)

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    cfg = load_task_config(os.path.join(REPO, "configs/train-tvqa-eval-tvqa-c3.yml"))
    if nodrop:
        zeros = {"hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0}
        cfg = dataclasses.replace(
            cfg,
            mmt=dataclasses.replace(cfg.mmt, **zeros, obj_drop=0.0, ocr_drop=0.0),
            text_bert=dataclasses.replace(cfg.text_bert, **zeros),
        )
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
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=0)
    # AOT compile so the trace and the HLO text describe one executable.
    compiled = step.lower(state, b, rng).compile()
    hlo = compiled.as_text()
    return compiled, state, b, rng, hlo


# ---------------------------------------------------------------------------
# HLO-side classification: which fusions contain the threefry RNG chain?
# ---------------------------------------------------------------------------

# Two attribution tiers:
#  * rng_hash — the threefry2x32 hash chain itself (xor/shift op kinds, or
#    threefry in the jax op_name metadata): pure bit-generation cost.
#  * dropout_touched — any fusion containing ops from jit(_bernoulli)/
#    jit(_uniform) scopes (bits->float conversion, threshold compare, keep
#    select). These fusions also carry unrelated fused work (matmul
#    epilogues etc.), so this tier OVERSTATES marginal dropout cost — the
#    drop-vs-nodrop category diff is the honest marginal number.
_RNG_HASH = re.compile(
    r"\b(xor\(|shift-left\(|shift-right-logical\(|rng-bit-generator|rng-get)"
    r"|threefry"
)
_DROPOUT_META = re.compile(r"_bernoulli|_uniform")
_FUSION_LINE = re.compile(
    r"%?([\w.\-]+) = [^=]*fusion\([^)]*\)[^\n]*calls=%?([\w.\-]+)"
)
_COMP_HEADER = re.compile(r"^%?([\w.\-]+) (?:\([^)]*\))? ?-> .* \{\s*$")


def rng_fusion_names(hlo: str):
    """Map trace op name -> True if its fused computation contains RNG ops.

    The optimized HLO text lists each fused computation as a block
    ``%fused_computation.N { ... }`` and each fusion instruction carries
    ``calls=%fused_computation.N``.
    """
    comp_bodies = {}
    cur = None
    for line in hlo.splitlines():
        stripped = line.strip()
        if cur is None:
            m = _COMP_HEADER.match(stripped)
            if m and stripped.endswith("{"):
                cur = m.group(1)
                comp_bodies[cur] = []
        else:
            if stripped.startswith("}"):
                cur = None
            else:
                comp_bodies[cur].append(stripped)
    def tier(body_text: str) -> str:
        if _RNG_HASH.search(body_text):
            return "rng_hash"
        if _DROPOUT_META.search(body_text):
            return "dropout_touched"
        return "other"

    comp_tier = {n: tier("\n".join(b)) for n, b in comp_bodies.items()}
    comp_root = {
        name: next((l for l in body if l.startswith("ROOT")), "")
        for name, body in comp_bodies.items()
    }
    fusion_tier, fusion_root = {}, {}
    for m in _FUSION_LINE.finditer(hlo):
        fusion, comp = m.group(1), m.group(2)
        fusion_tier[fusion] = comp_tier.get(comp, "other")
        fusion_root[fusion] = comp_root.get(comp, "")
    return fusion_tier, fusion_root


# ---------------------------------------------------------------------------
# Trace parsing
# ---------------------------------------------------------------------------

def parse_trace(log_dir: str, fusion_tier, fusion_root):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "/device:" in n.lower()}
    op_keys = {k for k, n in tid_names.items()
               if k[0] in device_pids and n == "XLA Ops"}
    mod_keys = {k for k, n in tid_names.items()
                if k[0] in device_pids and n == "XLA Modules"}

    n_steps = 0
    module_us = 0.0
    per_op, per_cat = {}, {}
    tier_us = {"rng_hash": 0.0, "dropout_touched": 0.0, "other": 0.0}
    op_cat = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in mod_keys:
            n_steps += 1
            module_us += float(e.get("dur", 0.0))
            continue
        if key not in op_keys:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "")
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        per_op[name] = per_op.get(name, 0.0) + dur
        op_cat[name] = cat
        per_cat[cat] = per_cat.get(cat, 0.0) + dur
        tier_us[fusion_tier.get(name, "other")] += dur
    if n_steps == 0:
        return None
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:15]
    return {
        "steps_traced": n_steps,
        "module_ms_per_step": module_us / 1e3 / n_steps,
        "op_ms_per_step": sum(per_op.values()) / 1e3 / n_steps,
        "category_ms_per_step": {
            k: round(v / 1e3 / n_steps, 3)
            for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])
        },
        "tier_ms_per_step": {
            k: round(v / 1e3 / n_steps, 3) for k, v in tier_us.items()
        },
        "top_ops": [
            {
                "name": n[:60],
                "ms": round(d / 1e3 / n_steps, 3),
                "category": op_cat.get(n, "?"),
                "tier": fusion_tier.get(n, "other"),
                "root": fusion_root.get(n, "")[:140],
            }
            for n, d in top
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodrop", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--log_dir", default="/tmp/train_trace")
    args = ap.parse_args()

    from sam_textvqa_tpu.utils.profiling import trace

    compiled, state, batch, rng, hlo = build(args.nodrop, args.batch)
    fusion_tier, fusion_root = rng_fusion_names(hlo)
    n_rng = sum(1 for t in fusion_tier.values() if t != "other")
    for _ in range(3):  # settle outside the trace
        state, metrics = compiled(state, batch, rng)
    float(metrics["loss"])

    tag = "nodrop" if args.nodrop else "drop"
    log_dir = os.path.join(args.log_dir, tag)
    try:
        with trace(log_dir):
            for _ in range(args.steps):
                state, metrics = compiled(state, batch, rng)
            float(metrics["loss"])
    except Exception as e:  # tunnel/platform may not support tracing
        print(json.dumps({"error": f"trace capture failed: {e!r}"}))
        sys.exit(3)

    summary = parse_trace(log_dir, fusion_tier, fusion_root)
    if summary is None:
        print(json.dumps({"error": "no usable trace produced",
                          "log_dir": log_dir}))
        sys.exit(3)
    summary["mode"] = tag
    summary["rng_fusions_in_hlo"] = n_rng
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
