#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (best_model.tar) to an orbax
checkpoint loadable by train.py --pretrained_eval.

Usage:
    python tools/convert_checkpoint.py \
        --torch_ckpt /path/to/best_model.tar \
        --config configs/train-tvqa-eval-tvqa-c3.yml \
        --num_answers 5000 \
        --out save/converted/best_model

The reference saves {"model_state_dict": ..., "optimizer_state_dict": ...,
"epoch_id": ...} (reference train.py:177-187), possibly with a DataParallel
``module.`` prefix (stripped here, like reference evaluator.py:180-192).
Only model weights convert; optimizer state is torch-Adam-specific and a
fresh optax state is created on load.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_answers", type=int, required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument(
        "--strict", action="store_true",
        help="fail instead of warning when any model parameter has no "
        "source in the torch checkpoint",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state
    from sam_textvqa_tpu.utils.checkpoint import (
        convert_torch_state_dict,
        save_checkpoint,
    )

    task_cfg = load_task_config(args.config)
    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("model_state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()}

    model = SAM4C(
        params_cfg=SAM4CParams(task_cfg.mmt, task_cfg.text_bert, args.num_answers)
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in device_batch(
            make_batch(task_cfg, 2, num_answers_vocab=args.num_answers)
        ).items()
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    converted, missing = convert_torch_state_dict(
        state_dict, params, strict=args.strict
    )
    if missing:
        print(f"WARNING: {len(missing)} unmapped params kept at init values:")
        for keys, src in missing[:20]:
            print("  ", keys, "<-", src)

    optimizer = make_optimizer(converted, task_cfg)
    state = create_train_state(converted, optimizer)
    epoch_id = int(ckpt.get("epoch_id", 0))
    val_score = float(ckpt.get("current_val_score", 0.0))
    save_checkpoint(args.out, state, epoch_id=epoch_id, val_score=val_score)
    print(f"converted checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
