"""Checkpointing: orbax save/restore with true training resume.

The reference saves a best-val checkpoint but never restores optimizer or
step for continued training (reference train.py:104,173-187 — resume state
is hard-coded to zero; SURVEY.md §5 flags this as a gap). Here both
directions work: best-checkpoint save AND full resume (params + optimizer
moments + step + epoch + RNG).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    ckpt_dir: str,
    state,
    *,
    epoch_id: int,
    val_score: float,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a checkpoint (params, optimizer state, step, metadata)."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    assert not extra, "extra metadata no longer supported (fixed schema)"
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {
            "epoch_id": np.asarray(epoch_id),
            "val_score": np.asarray(val_score, dtype=np.float64),
        },
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, payload, force=True)


def restore_checkpoint(ckpt_dir: str, state_template=None):
    """Restore a checkpoint; with a template the tree structure/dtypes are
    validated against it."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        if state_template is not None:
            template = {
                "step": np.asarray(state_template.step),
                "params": jax.device_get(state_template.params),
                "opt_state": jax.device_get(state_template.opt_state),
                "meta": {
                    "epoch_id": np.asarray(0),
                    "val_score": np.asarray(0.0, dtype=np.float64),
                },
            }
            restored = ckptr.restore(ckpt_dir, item=template)
        else:
            restored = ckptr.restore(ckpt_dir)
    return restored


# ---------------------------------------------------------------------------
# PyTorch reference checkpoint conversion
# ---------------------------------------------------------------------------

def _bert_layer_map(dst_prefix: Tuple[str, ...], src_prefix: str):
    """Name map for one BERT layer: our flax names -> torch state_dict."""
    return {
        dst_prefix + ("attention_self", "query", "weight"): f"{src_prefix}.attention.self.query.weight",
        dst_prefix + ("attention_self", "query", "bias"): f"{src_prefix}.attention.self.query.bias",
        dst_prefix + ("attention_self", "key", "weight"): f"{src_prefix}.attention.self.key.weight",
        dst_prefix + ("attention_self", "key", "bias"): f"{src_prefix}.attention.self.key.bias",
        dst_prefix + ("attention_self", "value", "weight"): f"{src_prefix}.attention.self.value.weight",
        dst_prefix + ("attention_self", "value", "bias"): f"{src_prefix}.attention.self.value.bias",
        dst_prefix + ("attention_output", "dense", "weight"): f"{src_prefix}.attention.output.dense.weight",
        dst_prefix + ("attention_output", "dense", "bias"): f"{src_prefix}.attention.output.dense.bias",
        dst_prefix + ("attention_output", "LayerNorm", "weight"): f"{src_prefix}.attention.output.LayerNorm.weight",
        dst_prefix + ("attention_output", "LayerNorm", "bias"): f"{src_prefix}.attention.output.LayerNorm.bias",
        dst_prefix + ("intermediate_dense", "weight"): f"{src_prefix}.intermediate.dense.weight",
        dst_prefix + ("intermediate_dense", "bias"): f"{src_prefix}.intermediate.dense.bias",
        dst_prefix + ("output_dense", "weight"): f"{src_prefix}.output.dense.weight",
        dst_prefix + ("output_dense", "bias"): f"{src_prefix}.output.dense.bias",
        dst_prefix + ("output_LayerNorm", "weight"): f"{src_prefix}.output.LayerNorm.weight",
        dst_prefix + ("output_LayerNorm", "bias"): f"{src_prefix}.output.LayerNorm.bias",
    }


def reference_name_map(mmt_layer_types, text_bert_layers: int = 3):
    """Full mapping: our param-tree paths -> reference state_dict keys
    (reference SAM4C module names, sam/sa_m4c.py; the evaluator strips any
    DataParallel ``module.`` prefix, evaluator.py:180-192)."""
    m: Dict[Tuple[str, ...], str] = {}

    # TextBert embeddings + layers
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        m[("text_bert", "embeddings", name)] = f"text_bert.embeddings.{name}.weight"
    m[("text_bert", "embeddings", "LayerNorm", "weight")] = "text_bert.embeddings.LayerNorm.weight"
    m[("text_bert", "embeddings", "LayerNorm", "bias")] = "text_bert.embeddings.LayerNorm.bias"
    for i in range(text_bert_layers):
        m.update(
            _bert_layer_map(
                ("text_bert", f"layer_{i}"), f"text_bert.encoder.layer.{i}"
            )
        )

    # modality encoders
    for ours, theirs in [
        ("linear_obj_feat_to_mmt_in", "linear_obj_feat_to_mmt_in"),
        ("linear_obj_bbox_to_mmt_in", "linear_obj_bbox_to_mmt_in"),
        ("linear_ocr_feat_to_mmt_in", "linear_ocr_feat_to_mmt_in"),
        ("linear_ocr_bbox_to_mmt_in", "linear_ocr_bbox_to_mmt_in"),
    ]:
        m[(ours, "weight")] = f"{theirs}.weight"
        m[(ours, "bias")] = f"{theirs}.bias"
    for ln in (
        "obj_feat_layer_norm",
        "obj_bbox_layer_norm",
        "ocr_feat_layer_norm",
        "ocr_bbox_layer_norm",
    ):
        m[(ln, "weight")] = f"{ln}.weight"
        m[(ln, "bias")] = f"{ln}.bias"

    # MMT: prev-pred embeddings
    ppe = ("mmt", "prev_pred_embeddings")
    m[ppe + ("position_embeddings",)] = "mmt.prev_pred_embeddings.position_embeddings.weight"
    m[ppe + ("token_type_embeddings",)] = "mmt.prev_pred_embeddings.token_type_embeddings.weight"
    for ln in ("ans_layer_norm", "ocr_layer_norm", "emb_layer_norm"):
        m[ppe + (ln, "weight")] = f"mmt.prev_pred_embeddings.{ln}.weight"
        m[ppe + (ln, "bias")] = f"mmt.prev_pred_embeddings.{ln}.bias"

    # MMT layers, interleaved by type
    n_i = s_i = i_i = 0
    for lt in mmt_layer_types:
        if lt == "n":
            m.update(
                _bert_layer_map(
                    ("mmt", f"normal_layer_{n_i}"),
                    f"mmt.encoder.normal_layers.{n_i}",
                )
            )
            n_i += 1
        elif lt == "s":
            m.update(
                _bert_layer_map(
                    ("mmt", f"spatial_layer_{s_i}"),
                    f"mmt.encoder.spatial_layers.{s_i}",
                )
            )
            s_i += 1
        elif lt == "i":
            m.update(
                _bert_layer_map(
                    ("mmt", f"implicit_layer_{i_i}"),
                    f"mmt.encoder.implicit_layers.{i_i}",
                )
            )
            i_i += 1

    # output heads
    m[("ocr_ptr_net", "query", "weight")] = "ocr_ptr_net.query.weight"
    m[("ocr_ptr_net", "query", "bias")] = "ocr_ptr_net.query.bias"
    m[("ocr_ptr_net", "key", "weight")] = "ocr_ptr_net.key.weight"
    m[("ocr_ptr_net", "key", "bias")] = "ocr_ptr_net.key.bias"
    m[("classifier_weight",)] = "classifier.weight"
    m[("classifier_bias",)] = "classifier.bias"
    return m


def convert_torch_state_dict(state_dict: Dict[str, Any], params_template):
    """Map a reference ``best_model.tar`` state_dict onto our param pytree.

    Torch Linear weights are (out, in) and our Dense stores the same layout,
    so the conversion is a pure rename. The reference's spatial attention
    maps 1:1 because its extra pieces (masks) are buffers, not params.
    """
    from ..models.sa_m4c import SAM4C  # noqa: F401  (doc anchor)

    flat_template = jax.tree_util.tree_flatten_with_path(params_template)
    # infer layer types from template names
    mmt_names = set()
    for path, _ in flat_template[0]:
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "mmt":
            mmt_names.add(keys[1])
    layer_types = []
    # reconstruct an ordering-insensitive name map: counts per type
    n = sum(1 for x in mmt_names if x.startswith("normal_layer_"))
    s = sum(1 for x in mmt_names if x.startswith("spatial_layer_"))
    i = sum(1 for x in mmt_names if x.startswith("implicit_layer_"))
    layer_types = ["n"] * n + ["s"] * s + ["i"] * i  # mapping ignores order
    tb_layers = len(
        {
            [p.key for p in path if hasattr(p, "key")][1]
            for path, _ in flat_template[0]
            if [p.key for p in path if hasattr(p, "key")][0] == "text_bert"
            and [p.key for p in path if hasattr(p, "key")][1].startswith("layer_")
        }
    )
    name_map = reference_name_map(layer_types, tb_layers)

    # strip DataParallel prefix if present
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = v

    out_flat = []
    missing = []
    for path, leaf in flat_template[0]:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        src = name_map.get(keys)
        if src is None or src not in sd:
            missing.append((keys, src))
            out_flat.append(leaf)
            continue
        arr = np.asarray(sd[src], dtype=np.float32)
        assert arr.shape == leaf.shape, (keys, src, arr.shape, leaf.shape)
        out_flat.append(arr)
    converted = jax.tree_util.tree_unflatten(flat_template[1], out_flat)
    return converted, missing
