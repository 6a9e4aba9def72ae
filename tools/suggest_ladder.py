#!/usr/bin/env python
"""Suggest `--ocr_bucket` / `--obj_bucket` width ladders from real occupancy.

The OCR and obj width ladders (evaluation/evaluator.py `_bucket_ladder`,
serving/engine.py `_route_width`) trade one extra compiled executable per
rung for running most batches at a narrower joint sequence. Which rungs pay
off depends entirely on the data's occupancy distribution — the reference
pads every sample to 50 OCR / 100 obj boxes (reference
textvqa_dataset.py:285-334) but real TextVQA images average far fewer.

This tool scans a dataset split, records the NEEDED width of every batch
(the max real-token count across its rows — exactly what the routers
compute), and exhaustively picks the expected-cost-minimizing ladder of
1..K rungs under a service-time model

    time(width) ~ (L(width) / L(full))**alpha ,   L = q + obj + ocr + dec

with alpha = 1.2 fit to the on-chip A/Bs in SCALING.md ("OCR-width bucket
ladder": ocr-25 +16.2%; "Obj-axis ladder": obj-50 +53.5%, grid +77.8% @96).
The prediction is a planning estimate, not a measurement — re-measure the
chosen ladder with tools/run_onchip_suite.sh or the serving demo.

Usage:
  python tools/suggest_ladder.py --config configs/train-tvqa-eval-tvqa-c3.yml \
      --synthetic 512 --batch_size 32 --split val --max_rungs 3
  # per-sample granularity (serving with small coalesced groups):
  python tools/suggest_ladder.py ... --granularity sample
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = 1.2  # fit from SCALING.md measured ladder wins (see module docstring)


def needed_width_counts(batches, mask_key, granularity):
    """Histogram of router-visible needed widths: {width: weight}."""
    from sam_textvqa_tpu.evaluation.evaluator import needed_ocr_width

    counts = {}
    for batch in batches:
        mask = batch[mask_key]
        if granularity == "batch":
            widths = [needed_ocr_width(mask)]
        else:
            widths = [needed_ocr_width(row) for row in mask]
        for w in widths:
            counts[w] = counts.get(w, 0) + 1
    return counts


def expected_time(counts, rungs, cost):
    """Mean service-time ratio when each width routes to the smallest
    rung that fits (falling through to full width)."""
    total = sum(counts.values())
    t = 0.0
    for w, n in counts.items():
        routed = next((r for r in rungs if w <= r), None)
        t += n * cost(routed)
    return t / total


def best_ladder(counts, max_rungs, cost, full):
    """Exhaustive search over observed widths for the ladder of 1..K rungs
    minimizing expected service time. Candidate rungs are the observed
    needed widths themselves — any rung between two observed values routes
    identically to the lower one but runs wider, so optima lie on
    observed widths."""
    candidates = sorted(w for w in counts if w < full and w > 0)
    results = []
    best_prev = 1.0
    for k in range(1, max_rungs + 1):
        if len(candidates) < k:
            break
        best = min(
            (expected_time(counts, c, cost), c)
            for c in itertools.combinations(candidates, k)
        )
        t, rungs = best
        results.append(
            {
                "rungs": list(rungs),
                "expected_speedup": 1.0 / t,
                "marginal_vs_fewer_rungs": best_prev / t,
                "extra_executables": k,
            }
        )
        best_prev = t
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic samples instead of real data")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_rungs", type=int, default=3)
    p.add_argument("--granularity", choices=["batch", "sample"],
                   default="batch",
                   help="'batch' mirrors offline eval routing (max over the "
                   "batch); 'sample' mirrors serving with tiny coalesced "
                   "groups")
    args = p.parse_args()

    # heavy imports after arg parsing so --help is instant
    import numpy as np  # noqa: F401  (train module expects it importable)

    import train as train_mod
    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.dataset import EpochBatcher

    task_cfg = load_task_config(args.config)
    vocab = train_mod.build_vocab(task_cfg)

    ds_args = argparse.Namespace(
        synthetic=args.synthetic, batch_size=args.batch_size, multihost=False
    )
    built = train_mod.build_datasets(task_cfg, ds_args, vocab)
    batchers = dict(zip(("train", "val", "test"), built))
    batcher = batchers[args.split]
    if batcher is None:
        raise SystemExit(f"split {args.split!r} has no data")

    # drain one deterministic epoch of host batches (no device work)
    if isinstance(batcher, EpochBatcher):
        batches = list(batcher.epoch_batches())
    else:  # already an iterable of batches
        batches = list(batcher)

    mmt = task_cfg.mmt
    q, o, c, t = (mmt.max_seq_length, mmt.max_obj_num, mmt.max_ocr_num,
                  mmt.num_decoding_steps)
    l_full = q + o + c + t
    out = {
        "split": args.split,
        "granularity": args.granularity,
        "batches": len(batches),
        "alpha": ALPHA,
    }
    for axis, mask_key, full, other_full in (
        ("ocr", "pad_ocr_mask", c, o),
        ("obj", "pad_obj_mask", o, c),
    ):
        counts = needed_width_counts(batches, mask_key, args.granularity)

        def cost(w, _full=full, _other=other_full):
            width = _full if w is None else w
            return ((q + _other + width + t) / l_full) ** ALPHA

        ladders = best_ladder(counts, args.max_rungs, cost, full)
        out[axis] = {
            "needed_width_histogram": {int(k): int(v)
                                       for k, v in sorted(counts.items())},
            "full_width": full,
            "ladders": ladders,
        }
        flag = "--ocr_bucket" if axis == "ocr" else "--obj_bucket"
        for lad in ladders:
            print(
                f"{axis}: {flag} "
                + ",".join(str(r) for r in lad["rungs"])
                + f"  predicted x{lad['expected_speedup']:.2f}"
                + f" (marginal x{lad['marginal_vs_fewer_rungs']:.2f},"
                + f" +{lad['extra_executables']} executables)"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
