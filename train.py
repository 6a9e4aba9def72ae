#!/usr/bin/env python
"""CLI driver for SA-M4C TPU training and evaluation.

Public interface mirrors the reference (reference train.py:28-47):

    python train.py --config configs/train-tvqa-eval-tvqa-c3.yml --tag run1
    python train.py --config ... --tag run1 --pretrained_eval save/run1/best_model

Extensions over the reference:
  --synthetic N     run on N deterministic synthetic samples (no data needed;
                    the analogue of the reference's debug split)
  --resume          continue training from save/<tag>/last_state (the
                    reference cannot resume, train.py:104)
  --model_parallel  tensor-parallel degree over the mesh's model axis
  --dtype           bf16 (default) or f32 compute
  --max_steps       stop after N optimizer steps (smoke runs)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import random

import numpy as np

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger("train")


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--tag", type=str, default="debug")
    parser.add_argument("--pretrained_eval", default="")
    parser.add_argument("--num_train_epochs", default=100, type=int)
    parser.add_argument("--seed", type=int, default=None,
                        help="overrides the YAML seed when set")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic samples instead of real data")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    parser.add_argument("--beam_size", type=int, default=1)
    parser.add_argument(
        "--attention_backend", choices=["xla", "pallas"], default="xla",
        help="spatial-attention implementation: xla (explicit masks, "
        "default) or pallas (ops/fused_attention.py kernel)",
    )
    parser.add_argument(
        "--ocr_bucket", type=lambda s: [int(x) for x in s.split(",") if x],
        default=None, metavar="N[,N...]",
        help="pretrained-eval only: compile narrower executable(s) at "
        "these OCR widths (a single int or a comma-separated ladder) and "
        "route each batch through the narrowest one that fits its rows "
        "(identical answers; sequence-length bucketing, SCALING.md)",
    )
    parser.add_argument(
        "--obj_bucket", type=lambda s: [int(x) for x in s.split(",") if x],
        default=None, metavar="N[,N...]",
        help="pretrained-eval only: the --ocr_bucket ladder on the obj "
        "(detectron box) axis; composes with --ocr_bucket as a routing "
        "grid (identical answers)",
    )
    parser.add_argument(
        "--decode_backend",
        choices=["auto", "xla", "xla_early", "xla_flat", "fused", "mega"],
        default="auto",
        help="greedy-decode implementation: auto (XLA one-row steps — "
        "fastest measured), or the opt-in pallas kernels fused "
        "(ops/decode_attention.py, per-layer) / mega (ops/decode_step.py, "
        "per-step) kept as A/B baselines (SCALING.md)",
    )
    parser.add_argument(
        "--prng",
        choices=["rbg", "threefry", "threefry_partitionable"],
        default="threefry",
        help="threefry (default; non-partitionable lowering, ~24%% faster "
        "dropout on a single host — forced back to partitionable under "
        "--multihost); threefry_partitionable (sharding-friendly stream); "
        "rbg (hardware RNG, fastest — faulted the round-1/2 libtpu under "
        "sustained load; survived a 300-step soak on the current one, "
        "SCALING.md)",
    )
    parser.add_argument(
        "--dropout_reuse", action="store_true",
        help="reuse one dropout mask per site type across the 6 MMT layers "
        "(+5.6%% train throughput; across-layer mask correlation deviates "
        "from the reference — loss-curve A/B in SCALING.md). Equivalent to "
        "SA-M4C.dropout_mask_reuse: true in the YAML.",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed (coordinator/process env vars per "
             "the standard JAX multi-process setup); the mesh then spans "
             "all hosts' devices",
    )
    parser.add_argument(
        "--grad_accum", type=int, default=1, metavar="N",
        help="accumulate gradients over N microbatches per optimizer "
             "update (one lax.scan inside the jitted step; ~N× less "
             "activation memory, same update up to float reassociation — "
             "training/step.py). batch_size must divide by N",
    )
    parser.add_argument(
        "--compile_cache", default=None, metavar="DIR",
        help="persistent XLA compilation cache directory (default: "
             "$SAM_COMPILE_CACHE if set); restarts skip recompiling every "
             "previously-seen executable",
    )
    return parser.parse_args()


def load_eval_gt(task_cfg, split):
    """{question_id: answers} from the configured Evaluation pickle, if
    present — the reference joins predictions against these eval_df pickles
    when the split's imdb carries no answers (reference evaluator.py:67-93).

    Accepts a pandas DataFrame with question_id/answers columns or a plain
    {qid: answers} dict.
    """
    dataset = task_cfg.val_on[0] if task_cfg.val_on else "textvqa"
    path = task_cfg.evaluation.get(f"{dataset}_{split}", "")
    if not path or not os.path.exists(path):
        return None
    import pickle

    def key(q):
        # ST-VQA question_ids are strings; TextVQA's are ints — preserve
        # the native identity so GT joins match the evaluator's qids
        return str(q) if isinstance(q, str) else int(q)

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict):
        return {key(k): list(v) for k, v in obj.items()}
    # pandas DataFrame (the reference's format)
    return {
        key(q): list(a)
        for q, a in zip(obj["question_id"], obj["answers"])
    }


def build_vocab(task_cfg):
    """Answer vocab from the configured file, or a synthetic one."""
    from sam_textvqa_tpu.data.vocab import VocabDict

    key = "vocab5k" if task_cfg.vocab_type == "5k" else "vocab5k_stvqa"
    path = task_cfg.vocabs.get(key, "")
    if path and os.path.exists(path):
        return VocabDict(path)
    logger.warning("vocab file %s missing; using synthetic vocab", path)
    words = ["<pad>", "<s>", "</s>", "<unk>"] + [
        f"word{i}" for i in range(4996)
    ]
    return VocabDict(words)


def build_datasets(task_cfg, args, vocab):
    from sam_textvqa_tpu.data.dataset import (
        ConcatDataset,
        EpochBatcher,
        build_dataset,
    )
    from sam_textvqa_tpu.data.processors import (
        FastTextProcessor,
        load_bert_tokenizer,
    )
    from sam_textvqa_tpu.data.synthetic import SyntheticDataset

    batch_size = args.batch_size or task_cfg.batch_size

    def imdb_exists(dset, split):
        prefix = "textvqa" if dset == "textvqa" else "stvqa"
        holder = getattr(task_cfg, f"{prefix}_imdb")
        return holder and os.path.exists(
            holder.format("debug" if task_cfg.debug else split)
        )

    have_real = all(imdb_exists(d, "train") for d in task_cfg.train_on)
    if not have_real and not args.synthetic:
        raise SystemExit(
            "Dataset files not found. Download them per data/README or run "
            "with --synthetic N."
        )

    if args.synthetic:
        n = args.synthetic
        train_ds = SyntheticDataset(task_cfg, n, seed=0,
                                    num_answers_vocab=len(vocab))
        val_ds = SyntheticDataset(task_cfg, max(n // 4, batch_size), seed=1,
                                  num_answers_vocab=len(vocab))
        test_ds = SyntheticDataset(task_cfg, max(n // 4, batch_size), seed=2,
                                   num_answers_vocab=len(vocab),
                                   with_answers=False)
    else:
        from sam_textvqa_tpu.data.features import open_feature_source

        tokenizer = load_bert_tokenizer()
        fasttext = FastTextProcessor(
            model_path=task_cfg.fasttext_bin or None,
            table_path=task_cfg.fasttext_table or None,
        )
        if fasttext.is_fallback:
            logger.warning(
                "No fastText source configured (fasttext_bin/fasttext_table "
                "in the YAML) — OCR word vectors fall back to deterministic "
                "hash noise. Real-data accuracy WILL be degraded; the "
                "reference uses wiki.en.bin (processors.py:191-200)."
            )
        splits = {}
        for split in ("train", "val", "test"):
            parts = []
            names = getattr(task_cfg, f"{split}_on")
            for dset in names:
                if not imdb_exists(dset, split):
                    # a missing optional split (e.g. test data not
                    # downloaded) must not block training
                    logger.warning("split %s/%s missing; skipping", dset, split)
                    continue
                prefix = "textvqa" if dset == "textvqa" else "stvqa"
                fmt = "trainval" if split in ("train", "val") else "test"
                obj_src = open_feature_source(
                    getattr(task_cfg, f"{prefix}_obj").format(fmt))
                ocr_src = open_feature_source(
                    getattr(task_cfg, f"{prefix}_ocr").format(fmt))
                cache = getattr(task_cfg, f"{prefix}_spatial_cache")
                parts.append(
                    build_dataset(
                        task_cfg, dset, split, tokenizer, fasttext, vocab,
                        obj_src, ocr_src,
                        cache_path=cache.format(split) if cache else None,
                    )
                )
            if not parts:
                splits[split] = None
            else:
                splits[split] = parts[0] if len(parts) == 1 else ConcatDataset(parts)
        train_ds, val_ds, test_ds = splits["train"], splits["val"], splits["test"]

    workers = min(task_cfg.num_workers, os.cpu_count() or 1)

    import jax as _jax

    def batcher(ds, train):
        if ds is None:
            return None
        # multi-host: the train batcher assembles only this process's row
        # slice (O(global_batch / hosts) host work); eval stays full-batch
        # per process (the decode path runs on local devices)
        nproc = _jax.process_count() if train else 1
        if batch_size % nproc != 0:
            nproc = 1  # fall back to redundant full-batch assembly
        return EpochBatcher(
            ds, batch_size, shuffle=train,
            seed=task_cfg.seed if train else 0, num_workers=workers,
            supervised=train,  # val/test are decode-only (no targets built)
            process_index=_jax.process_index() if nproc > 1 else 0,
            process_count=nproc,
        )

    return batcher(train_ds, True), batcher(val_ds, False), batcher(test_ds, False)


def main():
    args = get_args()
    import jax

    from sam_textvqa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(args.compile_cache)  # before the first jit
    if args.multihost:
        jax.distributed.initialize()
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    elif args.prng == "threefry" and not args.multihost:
        # non-partitionable threefry packs two 32-bit outputs per hash:
        # +24% train throughput on one chip (1128 -> 1401 samples/s, dropout
        # bits dominate). Across hosts the partitionable stream shards
        # random generation cleanly, so --multihost keeps the default.
        jax.config.update("jax_threefry_partitionable", False)
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.evaluation.evaluator import Evaluator
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
    from sam_textvqa_tpu.training.loop import train
    from sam_textvqa_tpu.utils.checkpoint import restore_checkpoint

    task_cfg = load_task_config(args.config)
    seed = args.seed if args.seed is not None else task_cfg.seed
    if seed != task_cfg.seed:
        task_cfg = dataclasses.replace(task_cfg, seed=seed)
    if args.dropout_reuse and not task_cfg.mmt.dropout_mask_reuse:
        task_cfg = dataclasses.replace(
            task_cfg,
            mmt=dataclasses.replace(task_cfg.mmt, dropout_mask_reuse=True),
        )
    random.seed(seed)
    np.random.seed(seed)

    save_path = os.path.join(task_cfg.output_dir, args.tag)
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "command.txt"), "w") as f:
        print(f"Command Line:\n{vars(args)}\n", file=f)
        print(f"Config File:\n{task_cfg}\n", file=f)

    logger.info("devices: %s", jax.devices())
    vocab = build_vocab(task_cfg)
    train_batcher, val_batcher, test_batcher = build_datasets(
        task_cfg, args, vocab
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = SAM4C(
        params_cfg=SAM4CParams(task_cfg.mmt, task_cfg.text_bert, len(vocab)),
        dtype=dtype,
        attention_backend=args.attention_backend,
    )
    sample = {
        k: jnp.asarray(v)
        for k, v in train_batcher.dataset.get_batch(
            range(min(2, len(train_batcher.dataset))),
            np.random.RandomState(0),
        ).items()
        if not k.startswith("_") and k != "question_id"
    }
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(seed)}, sample, deterministic=True
        )["params"]
    )()
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info("training parameters: %d", n_params)

    # finetune-frcn encoders start from pickled detectron fc7 weights
    # (reference textvqa_encoders.py:46-57, loaded at construction there)
    if task_cfg.mmt.frcn_encoder_type == "finetune_faster_rcnn_fpn_fc7":
        wf = task_cfg.mmt.detectron_weights_file
        bf = task_cfg.mmt.detectron_bias_file
        if wf and bf and os.path.exists(wf) and os.path.exists(bf):
            from sam_textvqa_tpu.models.encoders import (
                apply_detectron_fc7_weights,
            )

            params, installed = apply_detectron_fc7_weights(params, wf, bf)
            logger.info("detectron fc7 weights installed into %s", installed)
        else:
            logger.warning(
                "frcn_encoder_type=finetune_faster_rcnn_fpn_fc7 but no "
                "detectron weight files found (%r, %r) — encoders start "
                "random; the reference loads pickled detectron fc7 weights.",
                wf, bf,
            )

    # reference initializes the question encoder from bert-base-uncased
    # (reference sa_m4c.py:75-82); only relevant when training from scratch.
    # --resume only skips this when a checkpoint actually exists — a fresh
    # run launched with --resume still needs the pretrained encoder.
    will_resume = args.resume and os.path.exists(
        os.path.join(save_path, "last_state")
    )
    if (
        task_cfg.text_bert.text_bert_init_from_bert_base
        and not args.pretrained_eval
        and not will_resume
    ):
        src = task_cfg.text_bert.bert_base_weights
        if src and os.path.exists(src):
            from sam_textvqa_tpu.utils.checkpoint import (
                init_text_bert_from_bert_base,
            )

            params, n_loaded, missing = init_text_bert_from_bert_base(
                params, src
            )
            logger.info(
                "text_bert initialized from %s (%d tensors loaded)",
                src, n_loaded,
            )
            if missing:
                logger.warning(
                    "text_bert leaves without a bert-base source: %s",
                    [m[0] for m in missing],
                )
        else:
            logger.warning(
                "text_bert_init_from_bert_base is true but no local weights "
                "found (TextBERT.bert_base_weights=%r) — the question "
                "encoder starts RANDOM. The reference starts from "
                "bert-base-uncased; accuracy parity requires those weights.",
                src,
            )

    evaluator = Evaluator(
        model, vocab, metric=task_cfg.metric,
        decode_backend=args.decode_backend,
    )

    if args.pretrained_eval:
        restored = restore_checkpoint(args.pretrained_eval)
        params = restored["params"]
        out_dir = os.path.dirname(args.pretrained_eval.rstrip("/"))
        for split, batcher in (("test", test_batcher), ("val", val_batcher)):
            if batcher is None:
                continue
            gt = load_eval_gt(task_cfg, split)
            if args.beam_size > 1:
                result = evaluator.run_split_beam(
                    params, batcher.epoch_batches(), args.beam_size,
                    gt_answers_by_qid=gt, ocr_bucket=args.ocr_bucket,
                    obj_bucket=args.obj_bucket,
                )
                name = f"evalai_{split}_beam_{args.beam_size}.json"
            else:
                result = evaluator.run_split(
                    params, batcher.epoch_batches(), gt_answers_by_qid=gt,
                    ocr_bucket=args.ocr_bucket, obj_bucket=args.obj_bucket,
                )
                name = f"evalai_{split}.json"
            evaluator.dump_evalai(result, os.path.join(out_dir, name))
            if result["accuracy"] is not None:
                logger.info("%s accuracy: %.4f", split, result["accuracy"])
            if result.get("anls") is not None:
                logger.info("%s anls: %.4f", split, result["anls"])
        return

    state = train(
        task_cfg,
        model,
        params,
        train_batcher,
        val_batcher,
        vocab,
        save_dir=save_path,
        num_epochs=args.num_train_epochs,
        seed=seed,
        resume=args.resume,
        max_steps=args.max_steps,
        model_parallel=args.model_parallel,
        grad_accum=args.grad_accum,
    )

    # final eval with the trained weights (reference train.py:215-225)
    for split, batcher in (("test", test_batcher), ("val", val_batcher)):
        if batcher is None:
            continue
        result = evaluator.run_split(
            state.params, batcher.epoch_batches(),
            gt_answers_by_qid=load_eval_gt(task_cfg, split),
        )
        evaluator.dump_evalai(
            result, os.path.join(save_path, f"evalai_{split}.json")
        )
        if result["accuracy"] is not None:
            logger.info("%s accuracy: %.4f", split, result["accuracy"])


if __name__ == "__main__":
    main()
