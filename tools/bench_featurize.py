#!/usr/bin/env python
"""Measure request-time featurization cost (`serving.build_sample`).

The serving engine featurizes each raw request on the host: pad/truncate
regions, PHOC (C extension), fastText vectors, and the vectorized spatial
relation graph over the 150 padded boxes (what the reference precomputes
offline per dataset entry, textvqa_dataset.py:182-280). This tool times
build_sample end-to-end at full production shapes (100 obj / 50 ocr /
2048-d features) plus each stage in isolation, so the host-side cost can
be compared against the engine's measured device-side capacity
(SCALING.md "Serving latency": 2846 q/s at batch 32 on one v5e) —
i.e. how many host cores a TPU-VM needs before featurization, not the
chip, caps request rate.

Pure host measurement: no jax, no TPU.

Usage: python tools/bench_featurize.py [--n 200] [--ocr 30]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, n):
    fn()  # warm (builds the PHOC .so on first use)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=200, help="timing iterations")
    p.add_argument("--ocr", type=int, default=30,
                   help="real OCR tokens per request (reference images "
                   "average far fewer than the 50 padded slots)")
    p.add_argument("--config", default="configs/train-tvqa-eval-tvqa-c3.yml")
    args = p.parse_args()

    from sam_textvqa_tpu.config import load_task_config
    from sam_textvqa_tpu.data.features import pad_features
    from sam_textvqa_tpu.data.processors import FastTextProcessor, word_cleaner
    from sam_textvqa_tpu.ops.phoc import build_phoc_batch
    from sam_textvqa_tpu.ops.spatial_graph import build_spatial_graph
    from sam_textvqa_tpu.serving.engine import build_sample

    task_cfg = load_task_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.config)
    )
    mmt = task_cfg.mmt
    rng = np.random.RandomState(0)
    n_obj_real, n_ocr_real = mmt.max_obj_num, min(args.ocr, mmt.max_ocr_num)
    obj_feat = rng.randn(n_obj_real, 2048).astype(np.float32)
    ocr_feat = rng.randn(n_ocr_real, 2048).astype(np.float32)

    def boxes(n):
        b = rng.rand(n, 4).astype(np.float32)
        b[:, 2:] = np.minimum(b[:, :2] + 0.05 + b[:, 2:] * 0.3, 1.0)
        area = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[:, None]
        return np.concatenate([b, area], axis=1)

    obj_boxes, ocr_boxes = boxes(n_obj_real), boxes(n_ocr_real)
    words = ["stop", "exit", "cola", "open", "sale", "strasse", "25mph"]
    toks = [words[i % len(words)] for i in range(n_ocr_real)]
    q_idx = np.zeros(mmt.max_seq_length, np.int32)
    q_mask = np.ones(mmt.max_seq_length, np.float32)
    ft_proc = FastTextProcessor()  # hash fallback: UPPER bound is the .bin
    cleaned = [word_cleaner(w) for w in toks]

    # fastText backends: crc32 hash fallback (worst case — a fresh
    # RandomState per word), precomputed table, pure-Python .bin reader
    import tempfile

    from sam_textvqa_tpu.data.fasttext_bin import write_fasttext_bin

    uniq = sorted(set(cleaned))
    table = {w: rng.randn(300).astype(np.float32) for w in uniq}
    ft_table = FastTextProcessor(table=table)
    bin_path = os.path.join(tempfile.mkdtemp(), "fixture.bin")
    write_fasttext_bin(
        bin_path, uniq,
        np.stack([table[w] for w in uniq]), bucket=2000,
    )
    ft_bin = FastTextProcessor(model_path=bin_path)

    stages = {
        "pad_features": lambda: (
            pad_features(obj_feat, obj_boxes, mmt.max_obj_num),
            pad_features(ocr_feat, ocr_boxes, mmt.max_ocr_num),
        ),
        "phoc": lambda: build_phoc_batch(cleaned),
        "fasttext": lambda: ft_proc(cleaned, mmt.max_ocr_num),
        "fasttext_table": lambda: ft_table(cleaned, mmt.max_ocr_num),
        "fasttext_bin": lambda: ft_bin(cleaned, mmt.max_ocr_num),
        # first sight of every token (memo cache cleared): the subword
        # hashing cost the per-token cache amortizes away
        "fasttext_bin_cold": lambda: (
            ft_bin._cache.clear(),
            ft_bin(cleaned, mmt.max_ocr_num),
        ),
        "spatial_graph": lambda: build_spatial_graph(
            np.concatenate(
                [pad_features(obj_feat, obj_boxes, mmt.max_obj_num)[2][:, :4],
                 pad_features(ocr_feat, ocr_boxes, mmt.max_ocr_num)[2][:, :4]],
                axis=0,
            ),
            task_cfg.distance_threshold,
        ),
        "build_sample_total": lambda: build_sample(
            task_cfg, q_idx, q_mask, obj_feat, obj_boxes, toks,
            ocr_feat, ocr_boxes, fasttext=ft_bin,
        ),
    }
    out = {"iterations": args.n, "real_ocr_tokens": n_ocr_real}
    for name, fn in stages.items():
        out[f"{name}_ms"] = round(_time(fn, args.n), 3)
    total = out["build_sample_total_ms"]
    out["host_qps_per_core"] = round(1000.0 / total, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
