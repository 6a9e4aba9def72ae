"""Harness that executes the MOUNTED REFERENCE's own model code
(`/root/reference/sam/sa_m4c.py`) as a numerics oracle.

The reference imports ``pytorch_transformers.modeling_bert`` (version 1.0.0),
which is not installed here.  We provide a faithful shim of the handful of
BERT building blocks it uses — written from the well-known BERT math (the
same math already verified leaf-by-leaf in tests/test_torch_oracle*.py), not
copied from anywhere:

* ``BertConfig``            — attribute bag
* ``BertLayerNorm``         — TF-style LayerNorm (eps inside the sqrt)
* ``BertEmbeddings``        — word + position + type embeddings -> LN -> drop
* ``BertSelfAttention`` / ``BertSelfOutput`` / ``BertAttention``
* ``BertIntermediate`` (erf-GeLU) / ``BertOutput`` / ``BertLayer``
* ``BertEncoder``           — stack of BertLayers
* ``BertPreTrainedModel``   — config holder + init_weights

With the shim installed, the reference's entire novel model code
(SpatialBertSelfAttention quadrant masking sa_m4c.py:399-610, MMT /
PrevPredEmbeddings :773-948, the greedy loop :280-302) runs VERBATIM under
torch and is compared against our flax model fed identical weights via
``utils/checkpoint.py:reference_name_map`` — which simultaneously proves the
converter's name map is exact in the torch->flax direction.
"""

from __future__ import annotations

import math
import os
import sys
import types

import numpy as np

import torch
import torch.nn.functional as F
from torch import nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# pytorch_transformers==1.0.0 shim (the blocks the reference imports)
# ---------------------------------------------------------------------------

def _gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


class BertConfig:
    """Attribute bag with the BERT-base defaults pytorch_transformers ships;
    the reference hydrates it via ``BertConfig.from_dict`` (train.py:92-93)
    or constructs it directly in tests."""

    def __init__(self, **kwargs):
        self.vocab_size = 30522
        self.hidden_size = 768
        self.num_hidden_layers = 12
        self.num_attention_heads = 12
        self.intermediate_size = 3072
        self.hidden_act = "gelu"
        self.hidden_dropout_prob = 0.1
        self.attention_probs_dropout_prob = 0.1
        self.max_position_embeddings = 512
        self.type_vocab_size = 2
        self.initializer_range = 0.02
        self.layer_norm_eps = 1e-12
        self.output_attentions = False
        self.output_hidden_states = False
        for k, v in kwargs.items():
            setattr(self, k, v)

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


class BertLayerNorm(nn.Module):
    """TF-style LayerNorm: epsilon inside the square root."""

    def __init__(self, hidden_size, eps=1e-12):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(hidden_size))
        self.bias = nn.Parameter(torch.zeros(hidden_size))
        self.variance_epsilon = eps

    def forward(self, x):
        u = x.mean(-1, keepdim=True)
        s = (x - u).pow(2).mean(-1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.variance_epsilon)
        return self.weight * x + self.bias


class BertEmbeddings(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.word_embeddings = nn.Embedding(
            config.vocab_size, config.hidden_size, padding_idx=0
        )
        self.position_embeddings = nn.Embedding(
            config.max_position_embeddings, config.hidden_size
        )
        self.token_type_embeddings = nn.Embedding(
            config.type_vocab_size, config.hidden_size
        )
        self.LayerNorm = BertLayerNorm(config.hidden_size, eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, input_ids, token_type_ids=None, position_ids=None):
        seq_length = input_ids.size(1)
        if position_ids is None:
            position_ids = torch.arange(
                seq_length, dtype=torch.long, device=input_ids.device
            ).unsqueeze(0).expand_as(input_ids)
        if token_type_ids is None:
            token_type_ids = torch.zeros_like(input_ids)
        emb = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.dropout(self.LayerNorm(emb))


class BertSelfAttention(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.num_attention_heads = config.num_attention_heads
        self.attention_head_size = config.hidden_size // config.num_attention_heads
        self.all_head_size = self.num_attention_heads * self.attention_head_size
        self.query = nn.Linear(config.hidden_size, self.all_head_size)
        self.key = nn.Linear(config.hidden_size, self.all_head_size)
        self.value = nn.Linear(config.hidden_size, self.all_head_size)
        self.dropout = nn.Dropout(config.attention_probs_dropout_prob)
        self.output_attentions = config.output_attentions

    def _split(self, x):
        b, l, _ = x.shape
        return x.view(
            b, l, self.num_attention_heads, self.attention_head_size
        ).permute(0, 2, 1, 3)

    def forward(self, hidden_states, attention_mask, head_mask=None):
        q = self._split(self.query(hidden_states))
        k = self._split(self.key(hidden_states))
        v = self._split(self.value(hidden_states))
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(
            self.attention_head_size
        )
        scores = scores + attention_mask
        probs = nn.Softmax(dim=-1)(scores)
        probs = self.dropout(probs)
        if head_mask is not None:
            probs = probs * head_mask
        ctx = torch.matmul(probs, v).permute(0, 2, 1, 3).contiguous()
        ctx = ctx.view(ctx.size(0), ctx.size(1), self.all_head_size)
        return (ctx, probs) if self.output_attentions else (ctx,)


class BertSelfOutput(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.hidden_size)
        self.LayerNorm = BertLayerNorm(config.hidden_size, eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, hidden_states, input_tensor):
        hidden_states = self.dropout(self.dense(hidden_states))
        return self.LayerNorm(hidden_states + input_tensor)


class BertAttention(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.self = BertSelfAttention(config)
        self.output = BertSelfOutput(config)

    def forward(self, input_tensor, attention_mask, head_mask=None):
        self_outputs = self.self(input_tensor, attention_mask, head_mask)
        attention_output = self.output(self_outputs[0], input_tensor)
        return (attention_output,) + self_outputs[1:]


class BertIntermediate(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.intermediate_size)
        assert config.hidden_act == "gelu"

    def forward(self, hidden_states):
        return _gelu(self.dense(hidden_states))


class BertOutput(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.intermediate_size, config.hidden_size)
        self.LayerNorm = BertLayerNorm(config.hidden_size, eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, hidden_states, input_tensor):
        hidden_states = self.dropout(self.dense(hidden_states))
        return self.LayerNorm(hidden_states + input_tensor)


class BertLayer(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.attention = BertAttention(config)
        self.intermediate = BertIntermediate(config)
        self.output = BertOutput(config)

    def forward(self, hidden_states, attention_mask, head_mask=None):
        attention_outputs = self.attention(hidden_states, attention_mask, head_mask)
        attention_output = attention_outputs[0]
        layer_output = self.output(
            self.intermediate(attention_output), attention_output
        )
        return (layer_output,) + attention_outputs[1:]


class BertEncoder(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.output_attentions = config.output_attentions
        self.output_hidden_states = config.output_hidden_states
        self.layer = nn.ModuleList(
            [BertLayer(config) for _ in range(config.num_hidden_layers)]
        )

    def forward(self, hidden_states, attention_mask, head_mask=None):
        for i, layer_module in enumerate(self.layer):
            layer_outputs = layer_module(
                hidden_states,
                attention_mask,
                head_mask[i] if head_mask is not None else None,
            )
            hidden_states = layer_outputs[0]
        return (hidden_states,)


class BertPreTrainedModel(nn.Module):
    config_class = BertConfig
    base_model_prefix = "bert"

    def __init__(self, config, *args, **kwargs):
        super().__init__()
        self.config = config

    def _init_weights(self, module):
        if isinstance(module, (nn.Linear, nn.Embedding)):
            module.weight.data.normal_(mean=0.0, std=self.config.initializer_range)
        elif isinstance(module, BertLayerNorm):
            module.bias.data.zero_()
            module.weight.data.fill_(1.0)
        if isinstance(module, nn.Linear) and module.bias is not None:
            module.bias.data.zero_()

    def init_weights(self):
        self.apply(self._init_weights)

    @classmethod
    def from_pretrained(cls, *args, **kwargs):
        raise RuntimeError(
            "from_pretrained is unavailable offline; construct with "
            "text_bert_init_from_bert_base=False"
        )


def install_pytorch_transformers_shim():
    """Register the shim as ``pytorch_transformers(.modeling_bert)``."""
    if "pytorch_transformers.modeling_bert" in sys.modules:
        return sys.modules["pytorch_transformers.modeling_bert"]
    pkg = types.ModuleType("pytorch_transformers")
    mod = types.ModuleType("pytorch_transformers.modeling_bert")
    for name, obj in globals().items():
        if name.startswith("Bert"):
            setattr(mod, name, obj)
    pkg.modeling_bert = mod
    sys.modules["pytorch_transformers"] = pkg
    sys.modules["pytorch_transformers.modeling_bert"] = mod
    return mod


# ---------------------------------------------------------------------------
# Loading the reference model with its real dependency modules
# ---------------------------------------------------------------------------

def load_reference_sam4c(num_answers: int, bos_idx: int = 1, eos_idx: int = 2):
    """Import `/root/reference/sam/sa_m4c.py` verbatim (plus its real
    beam_search / textvqa_encoders dependencies) and return the module.

    The global registry is seeded with the keys the model reads at build
    time (answer_vocab, sa_m4c.py:169) and decode time (BOS_IDX, :291).
    """
    from conftest import install_reference_shims

    install_reference_shims()
    install_pytorch_transformers_shim()

    import importlib.util

    # tools.registry — the reference's 3-line global EasyDict singleton
    if "tools.registry" not in sys.modules:
        from easydict import EasyDict  # the conftest shim

        tools_pkg = types.ModuleType("tools")
        tools_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "tools")]
        reg_mod = types.ModuleType("tools.registry")
        reg_mod.registry = EasyDict()
        tools_pkg.registry = reg_mod
        sys.modules["tools"] = tools_pkg
        sys.modules["tools.registry"] = reg_mod
    registry = sys.modules["tools.registry"].registry
    registry["answer_vocab"] = list(range(num_answers))
    registry["BOS_IDX"] = bos_idx
    registry["EOS_IDX"] = eos_idx

    # sam package stub + the real dependency modules, loaded by path so the
    # package __init__ chain (which needs lmdb/cphoc) is bypassed
    if "sam" not in sys.modules:
        sam_pkg = types.ModuleType("sam")
        sam_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "sam")]
        sys.modules["sam"] = sam_pkg

    def _load(name, rel):
        if name in sys.modules:
            return sys.modules[name]
        path = os.path.join(REFERENCE_ROOT, rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("sam.textvqa_encoders", "sam/textvqa_encoders.py")
    _load("sam.beam_search", "sam/beam_search.py")
    return _load("sam.sa_m4c", "sam/sa_m4c.py")


def shim_config(dc_cfg, **overrides) -> BertConfig:
    """BertConfig view of one of our frozen dataclass configs; list-valued
    fields are restored from tuples (the reference indexes/iterates them)."""
    import dataclasses

    d = dataclasses.asdict(dc_cfg)
    d.update(overrides)
    for k, v in list(d.items()):
        if isinstance(v, tuple):
            d[k] = list(v)
    return BertConfig(**d)


def state_dict_from_flax_params(params, mmt_layer_types, text_bert_layers):
    """Our flax param tree -> reference torch state_dict (delegates to the
    package's reverse converter, tensor-izing its numpy arrays)."""
    from sam_textvqa_tpu.utils.checkpoint import (
        flax_params_to_reference_state_dict,
    )

    sd_np, unmapped = flax_params_to_reference_state_dict(
        params, mmt_layer_types, text_bert_layers
    )
    return {k: torch.tensor(v) for k, v in sd_np.items()}, unmapped


def torch_batch(batch_np, context_keys):
    """numpy batch -> the reference's batch_dict (torch tensors + the
    one-hot ``spatial_adj_matrices`` dict the reference consumes)."""
    import jax.numpy as jnp

    from sam_textvqa_tpu.ops.spatial_graph import (
        relation_head_lut,
        spatial_head_mask_from_classes,
    )

    out = {}
    for k, v in batch_np.items():
        if k.startswith("_") or k == "spatial_classes":
            continue
        t = torch.tensor(np.asarray(v))
        if k in ("question_indices", "train_prev_inds", "question_id"):
            t = t.long()
        elif t.dtype in (torch.float64,):
            t = t.float()
        out[k] = t
    adj = {}
    for key in context_keys:
        onehot = np.asarray(
            spatial_head_mask_from_classes(
                jnp.asarray(batch_np["spatial_classes"]),
                relation_head_lut(key).astype(np.float32),
            )
        )
        adj[key] = torch.tensor(onehot, dtype=torch.float32)
    out["spatial_adj_matrices"] = adj
    return out
