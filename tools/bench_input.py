#!/usr/bin/env python
"""Host input-pipeline benchmark: EpochBatcher assembly rate at production
shapes (batch 96, 100 obj + 50 OCR x 2048-d features, dynamic answer
sampling), independent of the device.

The pipeline must outrun the TPU's ~1405 samples/s train consumption; this
measures the margin. Usage:

    python tools/bench_input.py [num_workers ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sam_textvqa_tpu.config import load_task_config  # noqa: E402
from sam_textvqa_tpu.data.dataset import EpochBatcher  # noqa: E402
from sam_textvqa_tpu.data.synthetic import SyntheticDataset  # noqa: E402


def main():
    workers_list = [int(w) for w in sys.argv[1:]] or [0, 4, 8]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_task_config(
        os.path.join(here, "configs/train-tvqa-eval-tvqa-c3.yml")
    )
    n = 2048
    ds = SyntheticDataset(cfg, n, seed=0, num_answers_vocab=5000)
    for workers in workers_list:
        batcher = EpochBatcher(
            ds, batch_size=96, shuffle=True, seed=0, num_workers=workers,
            supervised=True,
        )
        # warm one epoch (feature-cache fill), then time one
        for _ in batcher.epoch_batches():
            pass
        t0 = time.time()
        count = 0
        for batch in batcher.epoch_batches():
            count += batch["question_indices"].shape[0]
        dt = time.time() - t0
        print(
            f"workers={workers}: {count / dt:,.0f} samples/s host-side "
            f"({count} samples in {dt:.2f}s)"
        )


if __name__ == "__main__":
    main()
