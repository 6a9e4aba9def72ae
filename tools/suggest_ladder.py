#!/usr/bin/env python
"""Suggest `--ocr_bucket` / `--obj_bucket` width ladders from real occupancy.

Offline-dataset front end for the shared planner in
sam_textvqa_tpu/serving/ladder.py (a live serving engine exposes the same
suggestions via ServingEngine.ladder_plan() / the TCP stats request): scans
a split, records the NEEDED width of every batch (the max real-token count
across its rows — exactly what the routers compute), and prints the
expected-cost-minimizing ladders of 1..K rungs with predicted speedups.
Predictions are planning estimates — re-measure the chosen ladder with
tools/run_onchip_suite.sh or the serving demo.

Usage:
  python tools/suggest_ladder.py --config configs/train-tvqa-eval-tvqa-c3.yml \
      --synthetic 512 --batch_size 32 --split val --max_rungs 3
  # per-sample granularity (serving with small coalesced groups):
  python tools/suggest_ladder.py ... --granularity sample
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sam_textvqa_tpu.serving.ladder import (  # noqa: E402
    ALPHA,
    best_ladder,
    expected_time,
    plan_axis,
)

__all__ = ["ALPHA", "best_ladder", "expected_time", "plan_axis"]


def needed_width_counts(batches, mask_key, granularity):
    """Histogram of router-visible needed widths: {width: weight}."""
    from sam_textvqa_tpu.evaluation.evaluator import needed_width

    counts = {}
    for batch in batches:
        mask = batch[mask_key]
        if granularity == "batch":
            widths = [needed_width(mask)]
        else:
            widths = [needed_width(row) for row in mask]
        for w in widths:
            counts[w] = counts.get(w, 0) + 1
    return counts


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

    import train as train_mod
    from sam_textvqa_tpu.config import load_task_config

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
    batches = list(batcher.epoch_batches())

    out = {
        "split": args.split,
        "granularity": args.granularity,
        "batches": len(batches),
        "alpha": ALPHA,
    }
    for axis, mask_key in (("ocr", "pad_ocr_mask"), ("obj", "pad_obj_mask")):
        counts = needed_width_counts(batches, mask_key, args.granularity)
        plan = plan_axis(counts, axis, task_cfg.mmt, args.max_rungs)
        if plan is None:
            continue
        out[axis] = plan
        flag = "--ocr_bucket" if axis == "ocr" else "--obj_bucket"
        for lad in plan["ladders"]:
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
