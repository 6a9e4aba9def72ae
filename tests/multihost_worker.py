"""Worker process for the multi-process multihost simulation test.

Run as:  python tests/multihost_worker.py <process_id> <port> <num_processes>

Each process owns 4 (nproc=2) or 8 (nproc=1) virtual CPU devices (XLA_FLAGS
set by the parent); the global mesh spans all processes' devices exactly
like train.py --multihost. Input is PER-PROCESS SHARDED: every process's
EpochBatcher assembles only its own contiguous row slice of each global
batch (per-row RNG streams make the sampled targets slicing-invariant), and
``make_global_batch`` stitches the global arrays via
``jax.make_array_from_process_local_data`` — no host ever builds the full
batch. The parent test asserts the loss matches a single-process run on the
identical global batch, proving slice assembly == full assembly.
"""

import dataclasses
import os
import sys

pid, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sam_textvqa_tpu.config import task_config_from_dict  # noqa: E402
from sam_textvqa_tpu.data.dataset import EpochBatcher  # noqa: E402
from sam_textvqa_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams  # noqa: E402
from sam_textvqa_tpu.parallel.mesh import (  # noqa: E402
    make_global_batch,
    make_mesh,
    shard_params,
)
from sam_textvqa_tpu.training.optimizer import make_optimizer  # noqa: E402
from sam_textvqa_tpu.training.step import (  # noqa: E402
    create_train_state,
    make_train_step,
)

NUM_ANSWERS = 32
GLOBAL_BATCH = 16


def main():
    n_devices = len(jax.devices())
    assert n_devices == 8, n_devices  # nproc processes x (8/nproc) devices

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 1}})
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        max_obj_num=8, max_ocr_num=6, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96,
        num_attention_heads=4,
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))

    # seed-deterministic dataset: identical pool on every process, but each
    # process ASSEMBLES only its slice of each global batch
    ds = SyntheticDataset(task, GLOBAL_BATCH, num_answers_vocab=NUM_ANSWERS)
    batcher = EpochBatcher(
        ds, GLOBAL_BATCH, shuffle=True, seed=5,
        process_index=jax.process_index(), process_count=nproc,
    )
    local = next(iter(batcher.epoch_batches()))
    assert local["question_indices"].shape[0] == GLOBAL_BATCH // nproc, (
        local["question_indices"].shape, nproc)
    print(f"MHSLICE {pid} {local['question_id'].tolist()}", flush=True)

    mesh = make_mesh(n_devices, model_parallel=2)
    gbatch = make_global_batch(local, mesh)
    gbatch = {k: v for k, v in gbatch.items() if not k.startswith("_")}

    local_jnp = {k: jnp.asarray(v) for k, v in local.items()
                 if not k.startswith("_")}
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, local_jnp, deterministic=True
        )["params"]
    )()
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    p_shard = shard_params(params, mesh, tensor_parallel=True)
    state = state._replace(params=jax.device_put(state.params, p_shard))

    train_step = jax.jit(make_train_step(model, optimizer))
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        state, metrics = train_step(state, gbatch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"MHLOSS {pid} {loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
