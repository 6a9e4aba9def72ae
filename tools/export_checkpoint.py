#!/usr/bin/env python
"""Export an orbax checkpoint BACK to the reference's torch format.

The inverse of tools/convert_checkpoint.py: weights trained in this
framework become a ``best_model.tar`` the reference's own evaluator can
load (reference evaluator.py:179-192 reads ``checkpoint["model_state_dict"]``
and tolerates the DataParallel prefix; reference train.py:177-187 is the
writer this mimics). The rename is the same bijection the in-suite oracle
uses to run the reference's sa_m4c.py on our weights, so exported
checkpoints are covered by those parity tests.

Usage:
  python tools/export_checkpoint.py --ckpt save/run1/best_model \
      --config configs/train-tvqa-eval-tvqa-c3.yml --num_answers 5000 \
      --out /tmp/best_model.tar [--strict]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True,
                        help="orbax checkpoint dir (best_model / last_state)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_answers", type=int, required=True)
    parser.add_argument("--out", required=True, help="output .tar path")
    parser.add_argument(
        "--strict", action="store_true",
        help="fail if any of our parameters has no reference name "
        "(instead of exporting the mappable subset with a warning)",
    )
    args = parser.parse_args()

    import torch

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.utils.checkpoint import (
        flax_params_to_reference_state_dict,
        restore_checkpoint,
    )

    task_cfg = load_task_config(args.config)
    restored = restore_checkpoint(args.ckpt)
    params = restored["params"] if "params" in restored else restored
    step = int(restored.get("step", 0)) if hasattr(restored, "get") else 0

    sd_np, unmapped = flax_params_to_reference_state_dict(
        params, list(task_cfg.mmt.layer_type_list),
        task_cfg.text_bert.num_hidden_layers,
    )
    if unmapped:
        msg = f"{len(unmapped)} parameters have no reference name: {unmapped}"
        if args.strict:
            raise SystemExit(msg)
        print(f"warning: {msg}", file=sys.stderr)

    payload = {
        "model_state_dict": {k: torch.tensor(v) for k, v in sd_np.items()},
        "global_step": step,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(payload, args.out)
    print(f"exported {len(sd_np)} tensors (step {step}) to {args.out}")


if __name__ == "__main__":
    main()
