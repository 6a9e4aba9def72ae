#!/usr/bin/env python
"""Export the decode grid to a deployable AOT artifact directory.

    python tools/export_decode.py --config configs/train-tvqa-eval-tvqa-c3.yml \
        --checkpoint save/run/best_model --out artifacts/c3 \
        --buckets 1,8,32 --ocr_bucket 25 --obj_bucket 50

Writes one StableHLO executable per (batch bucket) x (width rung) cell plus
a manifest (serving/artifact.py). The artifact deserializes and runs with
NO model Python — deploy it with the orbax checkpoint (weights stay a
runtime argument, hot-swappable) and the answer vocab. ``--check`` reloads
the artifact and verifies a zero batch round-trips on this host.

The reference repo has no deployment artifact; its eval requires the full
training repo importable (reference evaluator.py:28-63).
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")  # repo root, when run as tools/export_decode.py

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("export_decode")


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint dir (omit for random smoke weights)")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--buckets", default="1,8,32")
    p.add_argument("--ocr_bucket", default=None, metavar="N[,N...]")
    p.add_argument("--obj_bucket", default=None, metavar="N[,N...]")
    p.add_argument("--backend", default="xla",
                   choices=["xla", "xla_early"],
                   help="per-cell decode backend baked into the export")
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--platforms", default=None,
                   help="comma list (default: this backend + cpu)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run a zero batch")
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.serving.artifact import (
        _zero_batch,
        export_decode_artifact,
        load_decode_artifact,
    )
    from sam_textvqa_tpu.serving.ladder import normalize_ladder
    from train import build_vocab

    task_cfg = load_task_config(args.config)
    vocab = build_vocab(task_cfg)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = SAM4C(
        params_cfg=SAM4CParams(task_cfg.mmt, task_cfg.text_bert, len(vocab)),
        dtype=dtype,
    )
    if args.checkpoint:
        from sam_textvqa_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint)["params"]
    else:
        logger.warning("no --checkpoint: exporting RANDOM weights (smoke)")
        from sam_textvqa_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(task_cfg, 2, num_answers_vocab=len(vocab))
        sample = {
            k: jnp.asarray(v)
            for k, v in ds.get_batch(range(2)).items()
            if not k.startswith("_") and k != "question_id"
        }
        params = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(task_cfg.seed)},
                sample,
                deterministic=True,
            )["params"]
        )()

    def parse_ladder(flag, full, axis):
        if flag is None:
            return ()
        return normalize_ladder(
            [int(x) for x in str(flag).split(",")], full, axis
        )

    special = vocab.special_ids()
    manifest = export_decode_artifact(
        model, params, args.out,
        bos=special.bos, eos=special.eos,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        obj_buckets=parse_ladder(
            args.obj_bucket, task_cfg.mmt.max_obj_num, "obj"
        ),
        ocr_buckets=parse_ladder(
            args.ocr_bucket, task_cfg.mmt.max_ocr_num, "ocr"
        ),
        backend=args.backend,
        beam_size=args.beam_size,
        platforms=args.platforms.split(",") if args.platforms else None,
        answer_vocab=vocab,  # embedded: config-free TCP serving
    )
    total = sum(c["bytes"] for c in manifest["cells"])
    logger.info(
        "exported %d cells (%.1f MB) to %s",
        len(manifest["cells"]), total / 1e6, args.out,
    )
    if args.check:
        art = load_decode_artifact(args.out)
        b = min(c["batch"] for c in manifest["cells"])
        zb = _zero_batch(task_cfg.mmt, b, model.dtype)
        scores, pred = art.call(params, zb)
        assert np.asarray(pred).shape[0] == b
        logger.info("reload check ok: bucket-%d zero batch decoded", b)


if __name__ == "__main__":
    main()
