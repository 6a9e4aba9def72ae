"""Worker process for the 2-process multihost simulation test.

Run as:  python tests/multihost_worker.py <process_id> <port> <num_processes>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); the
global mesh spans all processes' devices exactly like train.py --multihost.
Every process feeds the SAME deterministic host batch (the EpochBatcher is
seed-deterministic, so real multihost runs have this property too) and
jax.device_put slices out the local shards.
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
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch  # noqa: E402
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams  # noqa: E402
from sam_textvqa_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    shard_params,
)
from sam_textvqa_tpu.training.optimizer import make_optimizer  # noqa: E402
from sam_textvqa_tpu.training.step import (  # noqa: E402
    create_train_state,
    make_train_step,
)

NUM_ANSWERS = 32


def main():
    n_devices = len(jax.devices())
    assert n_devices == 8, n_devices  # 2 processes x 4 virtual CPU devices

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

    # identical host batch on every process (seeded) — device_put with the
    # global sharding slices each process's addressable shards
    host = device_batch(make_batch(task, 16, num_answers_vocab=NUM_ANSWERS))
    mesh = make_mesh(n_devices, model_parallel=2)
    bs = batch_sharding(mesh)

    batch_local = {k: jnp.asarray(v) for k, v in host.items()}
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, batch_local, deterministic=True
        )["params"]
    )()
    optimizer = make_optimizer(params, task)
    state = create_train_state(params, optimizer)
    p_shard = shard_params(params, mesh, tensor_parallel=True)
    state = state._replace(params=jax.device_put(state.params, p_shard))
    gbatch = {k: jax.device_put(np.asarray(v), bs) for k, v in host.items()}

    train_step = jax.jit(make_train_step(model, optimizer))
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        state, metrics = train_step(state, gbatch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"MHLOSS {pid} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
