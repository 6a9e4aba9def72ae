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

    # finetune frcn encoders (reference ImageEncoder wraps the Linear as
    # ``module.lc``, textvqa_encoders.py:17-60); absent for "default"
    for enc in ("obj_faster_rcnn_fc7", "ocr_faster_rcnn_fc7"):
        m[(enc, "lc", "weight")] = f"{enc}.module.lc.weight"
        m[(enc, "lc", "bias")] = f"{enc}.module.lc.bias"

    # TextBERT->MMT projection, present only when hidden sizes differ
    # (reference sa_m4c.py:93-103); unused entries are never consulted
    m[("text_bert_out_linear", "weight")] = "text_bert_out_linear.weight"
    m[("text_bert_out_linear", "bias")] = "text_bert_out_linear.bias"

    # output heads
    m[("ocr_ptr_net", "query", "weight")] = "ocr_ptr_net.query.weight"
    m[("ocr_ptr_net", "query", "bias")] = "ocr_ptr_net.query.bias"
    m[("ocr_ptr_net", "key", "weight")] = "ocr_ptr_net.key.weight"
    m[("ocr_ptr_net", "key", "bias")] = "ocr_ptr_net.key.bias"
    m[("classifier_weight",)] = "classifier.weight"
    m[("classifier_bias",)] = "classifier.bias"

    # optional learned spatial head bias — torch Embedding(1, hidden)
    # (reference sa_m4c.py:439-443; applied at :600-603). Entries for params
    # absent from the template (use_bias: false) are simply never consulted.
    n_spatial = sum(1 for lt in mmt_layer_types if lt == "s")
    for s in range(n_spatial):
        m[("mmt", f"spatial_layer_{s}", "attention_self", "biases")] = (
            f"mmt.encoder.spatial_layers.{s}.attention.self.biases.weight"
        )

    # optional aux spatial-relation head (reference sa_m4c.py:173-177;
    # SimpleClassifier = Sequential(Linear, GeLU, LayerNorm, Linear) at
    # :1031-1042, so torch indices 0/2/3 map to our dense0/ln/dense1)
    for head in ("origin_transform", "dest_transform"):
        for ours, theirs in (("dense0", "0"), ("ln", "2"), ("dense1", "3")):
            m[(head, ours, "weight")] = f"{head}.logit_fc.{theirs}.weight"
            m[(head, ours, "bias")] = f"{head}.logit_fc.{theirs}.bias"
    m[("spatial_classifier", "weight")] = "spatial_classifier.weight"
    m[("spatial_classifier", "bias")] = "spatial_classifier.bias"
    return m


def flax_params_to_reference_state_dict(
    params, mmt_layer_types, text_bert_layers: int = 3
):
    """The REVERSE conversion: our flax param tree -> reference state_dict
    names, as float32 numpy arrays (torch-free; callers tensor-ize). A pure
    rename via :func:`reference_name_map` — Dense already stores the torch
    (out, in) layout. Returns ``(state_dict, unmapped_paths)``; with the
    weights loaded into the reference's own SAM4C, forward outputs match
    ours (tests/test_reference_model_oracle.py executes exactly this)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    name_map = reference_name_map(list(mmt_layer_types), text_bert_layers)
    sd, unmapped = {}, []
    for path, leaf in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        dst = name_map.get(keys)
        if dst is None:
            unmapped.append(keys)
            continue
        sd[dst] = np.asarray(leaf, dtype=np.float32)
    return sd, unmapped


def convert_torch_state_dict(
    state_dict: Dict[str, Any], params_template, strict: bool = False
):
    """Map a reference ``best_model.tar`` state_dict onto our param pytree.

    Torch Linear weights are (out, in) and our Dense stores the same layout,
    so the conversion is a pure rename. The reference's spatial attention
    maps 1:1 because its extra pieces (masks) are buffers, not params.

    With ``strict`` the conversion raises if any template leaf has no source
    in the state_dict (instead of silently keeping its random init).
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
    if strict and missing:
        used = {name_map.get(tuple(p.key for p in path if hasattr(p, "key")))
                for path, _ in flat_template[0]}
        unconsumed = sorted(k for k in sd if k not in used)
        raise ValueError(
            f"strict conversion: {len(missing)} template leaves have no "
            f"source: {missing[:10]}...; unconsumed state_dict keys "
            f"(first 10): {unconsumed[:10]}"
        )
    converted = jax.tree_util.tree_unflatten(flat_template[1], out_flat)
    return converted, missing


# ---------------------------------------------------------------------------
# TextBERT initialization from bert-base-uncased
# ---------------------------------------------------------------------------

def bert_base_name_map(text_bert_layers: int = 3):
    """Our ``text_bert`` subtree paths -> HF/torch bert-base state_dict keys
    (without the optional ``bert.`` prefix). The reference initializes its
    3-layer question encoder with ``TextBert.from_pretrained(
    "bert-base-uncased")`` (reference sam/sa_m4c.py:75-82); the first
    ``text_bert_layers`` encoder layers plus the embeddings transfer."""
    m: Dict[Tuple[str, ...], str] = {}
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        m[("text_bert", "embeddings", name)] = f"embeddings.{name}.weight"
    m[("text_bert", "embeddings", "LayerNorm", "weight")] = "embeddings.LayerNorm.weight"
    m[("text_bert", "embeddings", "LayerNorm", "bias")] = "embeddings.LayerNorm.bias"
    for i in range(text_bert_layers):
        m.update(
            _bert_layer_map(("text_bert", f"layer_{i}"), f"encoder.layer.{i}")
        )
    return m


def load_bert_base_state_dict(source: str) -> Dict[str, np.ndarray]:
    """Load a bert-base-uncased state_dict from a local file or directory.

    Accepts a torch ``.bin``/``.pt``/``.tar`` file, a ``.safetensors`` file,
    an ``.npz``, or an HF model directory containing one of those. Strips
    ``bert.``/``module.`` prefixes and HF's ``gamma``/``beta`` LayerNorm
    aliases so the result matches :func:`bert_base_name_map`.
    """
    if os.path.isdir(source):
        for cand in ("pytorch_model.bin", "model.safetensors", "model.npz"):
            p = os.path.join(source, cand)
            if os.path.exists(p):
                source = p
                break
        else:
            raise FileNotFoundError(f"no model weights found in {source}")
    if source.endswith(".npz"):
        with np.load(source) as z:
            sd = {k: z[k] for k in z.files}
    elif source.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(source)
    else:
        import torch

        raw = torch.load(source, map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in raw.items()}
    out = {}
    for k, v in sd.items():
        for prefix in ("module.", "bert."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        # pytorch_transformers-era checkpoints name LayerNorm params g/b
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[k] = np.asarray(v)
    return out


def init_text_bert_from_bert_base(params, source: str):
    """Hydrate the ``text_bert`` subtree of ``params`` from a local
    bert-base-uncased checkpoint (reference sam/sa_m4c.py:75-82).

    Returns ``(new_params, n_loaded, missing)`` where ``missing`` lists
    text_bert leaves that found no source key (should be empty for a real
    bert-base checkpoint).
    """
    sd = load_bert_base_state_dict(source)
    tb_layers = len(
        {k for k in params["text_bert"] if k.startswith("layer_")}
    )
    name_map = bert_base_name_map(tb_layers)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out_flat, missing, n_loaded = [], [], 0
    for path, leaf in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys[0] != "text_bert":
            out_flat.append(leaf)
            continue
        src = name_map.get(keys)
        if src is None or src not in sd:
            missing.append((keys, src))
            out_flat.append(leaf)
            continue
        arr = np.asarray(sd[src], dtype=np.float32)
        if keys[-1] == "position_embeddings" and arr.shape[0] > leaf.shape[0]:
            arr = arr[: leaf.shape[0]]  # truncate 512 -> max_seq positions
        assert arr.shape == leaf.shape, (keys, src, arr.shape, leaf.shape)
        out_flat.append(arr.astype(np.asarray(leaf).dtype))
        n_loaded += 1
    return jax.tree_util.tree_unflatten(treedef, out_flat), n_loaded, missing
