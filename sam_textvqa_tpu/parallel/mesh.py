"""Device mesh + sharding layer.

The reference's only multi-device mechanism is single-process
``torch.nn.DataParallel`` (reference train.py:111-112): replicate the module,
scatter the batch, gather outputs over CUDA. The TPU-native equivalent is a
``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis; XLA emits
the gradient all-reduce over ICI under ``jit``.

Because the model is small (~90M params) pure data parallelism is the right
production mapping, but the layer also supports a ``model`` axis with
Megatron-style tensor sharding of the transformer matmuls
(:func:`param_sharding_rules`), so the same train step scales to dp x tp
meshes — XLA inserts the collectives from the shardings alone.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, model) mesh; model axis size 1 collapses to pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def stitch_process_local(host_batch: Dict, sharding) -> Dict:
    """Per-process LOCAL rows -> globally sharded ``jax.Array``s under
    ``sharding`` via ``jax.make_array_from_process_local_data``; host-only
    keys (``_``-prefixed) pass through untouched. Shared by
    :func:`make_global_batch` and the prefetch producer
    (data/prefetch.py) — the single home of the stitching logic."""
    out = {}
    for k, v in host_batch.items():
        if k.startswith("_"):
            out[k] = v
        else:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v)
            )
    return out


def make_global_batch(host_batch: Dict, mesh: Mesh) -> Dict:
    """Per-process LOCAL rows -> globally batch-sharded ``jax.Array``s.

    Each process supplies only its own ``global_batch / process_count``
    slice (from a process-sharded ``EpochBatcher``); the global array is
    stitched without any host ever materializing the full batch.
    """
    return stitch_process_local(host_batch, batch_sharding(mesh))


# (regex over flattened param path, partition spec) — first match wins.
# Megatron mapping for the (out, in)-layout torch-style weights:
#   qkv / intermediate: split the OUTPUT dim over 'model'
#   attention output / FFN output: split the INPUT dim over 'model'
#   embeddings / classifier: split the vocab dim over 'model'
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(query|key|value)/weight$", P("model", None)),
    (r".*(query|key|value)/bias$", P("model")),
    (r".*intermediate_dense/weight$", P("model", None)),
    (r".*intermediate_dense/bias$", P("model")),
    (r".*attention_output/dense/weight$", P(None, "model")),
    (r".*output_dense/weight$", P(None, "model")),
    (r".*word_embeddings$", P("model", None)),
    (r"classifier_weight$", P("model", None)),
    (r"classifier_bias$", P("model")),
)


def param_sharding_rules(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for the params.

    With ``tensor_parallel`` (and a model axis > 1) large matrices follow the
    Megatron rules above; otherwise everything is replicated.
    """
    use_tp = tensor_parallel and mesh.shape["model"] > 1

    def spec_for(path, leaf):
        if not use_tp:
            return NamedSharding(mesh, P())
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = param_sharding_rules(key)
        # only shard when the dimension divides evenly
        dims = [d for d in spec if d is not None]
        if dims:
            axis_index = list(spec).index("model") if "model" in spec else -1
            if axis_index >= 0 and (
                axis_index >= leaf.ndim
                or leaf.shape[axis_index] % mesh.shape["model"] != 0
            ):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)
