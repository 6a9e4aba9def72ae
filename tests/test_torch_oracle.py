"""Numerics oracle: torch implementations of the exact reference formulas
(pytorch_transformers==1.0.0 BERT math, TF-style LayerNorm with eps inside
the sqrt, erf GeLU, -10000 additive masks) cross-checked against the flax
layers with identical weights. Covers SURVEY.md §7 'hard part #1' (fp32
parity of the eval-path math)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sam_textvqa_tpu.models.bert import BertLayer
from sam_textvqa_tpu.models.layers import LayerNormTF, gelu_erf
from sam_textvqa_tpu.models.mmt import OcrPtrNet, PrevPredEmbeddings

ATOL = 2e-5
RTOL = 2e-5


def t(x):
    return torch.tensor(np.asarray(x, np.float32))


def torch_layernorm_tf(x, weight, bias, eps=1e-12):
    # reference BertLayerNorm fallback (sa_m4c.py:1016-1028)
    u = x.mean(-1, keepdim=True)
    s = (x - u).pow(2).mean(-1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return weight * x + bias


def torch_gelu(x):
    # reference gelu (sa_m4c.py:985-991)
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def test_layernorm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 32).astype(np.float32) * 3
    ln = LayerNormTF()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    w = rng.randn(32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    params = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    ours = np.asarray(ln.apply({"params": params}, jnp.asarray(x)))
    ref = torch_layernorm_tf(t(x), t(w), t(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


def test_gelu_matches_torch():
    x = np.linspace(-6, 6, 1001, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(gelu_erf(jnp.asarray(x))), torch_gelu(t(x)).numpy(),
        rtol=1e-6, atol=1e-6,
    )


def _torch_bert_layer(p, x, bias):
    """Literal pytorch_transformers BertLayer math from the reference's
    composition (BertSelfAttention -> BertSelfOutput -> BertIntermediate ->
    BertOutput) with our param dict."""
    def lin(name, v):
        return torch.nn.functional.linear(v, t(p[name]["weight"]), t(p[name]["bias"]))

    b, l, d = x.shape
    h = 4
    hd = d // h

    def split(v):
        return v.view(b, l, h, hd).permute(0, 2, 1, 3)

    q = split(lin("query", x))
    k = split(lin("key", x))
    v = split(lin("value", x))
    scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(hd)
    scores = scores + t(bias)
    probs = torch.nn.Softmax(dim=-1)(scores)
    ctx = torch.matmul(probs, v).permute(0, 2, 1, 3).contiguous().view(b, l, d)
    attn = torch_layernorm_tf(
        torch.nn.functional.linear(
            ctx, t(p["attention_output"]["dense"]["weight"]),
            t(p["attention_output"]["dense"]["bias"]),
        ) + x,
        t(p["attention_output"]["LayerNorm"]["weight"]),
        t(p["attention_output"]["LayerNorm"]["bias"]),
    )
    inter = torch_gelu(
        torch.nn.functional.linear(
            attn, t(p["intermediate_dense"]["weight"]),
            t(p["intermediate_dense"]["bias"]),
        )
    )
    out = torch.nn.functional.linear(
        inter, t(p["output_dense"]["weight"]), t(p["output_dense"]["bias"])
    )
    return torch_layernorm_tf(
        out + attn,
        t(p["output_LayerNorm"]["weight"]),
        t(p["output_LayerNorm"]["bias"]),
    )


def _query_params(p):
    # flatten nested flax params to plain numpy for the torch oracle
    return jax.tree.map(lambda v: np.asarray(v), p)


def test_bert_layer_matches_torch():
    rng = np.random.RandomState(1)
    b, l, d = 2, 9, 32
    x = rng.randn(b, l, d).astype(np.float32)
    mask = (rng.rand(b, l) < 0.8).astype(np.float32)
    bias = ((1.0 - mask) * -10000.0)[:, None, None, :]

    layer = BertLayer(hidden_size=d, num_heads=4, intermediate_size=64,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bias))["params"]
    ours = np.asarray(
        layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(bias),
                    deterministic=True)
    )
    p = _query_params(params)
    p_flat = {
        "query": p["attention_self"]["query"],
        "key": p["attention_self"]["key"],
        "value": p["attention_self"]["value"],
        "attention_output": p["attention_output"],
        "intermediate_dense": p["intermediate_dense"],
        "output_dense": p["output_dense"],
        "output_LayerNorm": p["output_LayerNorm"],
    }
    ref = _torch_bert_layer(
        p_flat, t(x), np.broadcast_to(bias, (b, 1, l, l))
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


def test_prev_pred_embeddings_matches_torch():
    rng = np.random.RandomState(2)
    b, t_len, d, n_ans, n_ocr = 2, 5, 32, 11, 4
    ans_emb = rng.randn(n_ans, d).astype(np.float32)
    ocr_emb = rng.randn(b, n_ocr, d).astype(np.float32)
    prev = rng.randint(0, n_ans + n_ocr, size=(b, t_len)).astype(np.int32)

    mod = PrevPredEmbeddings(hidden_size=d, hidden_dropout_prob=0.0)
    params = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(ans_emb), jnp.asarray(ocr_emb),
        jnp.asarray(prev),
    )["params"]
    ours = np.asarray(
        mod.apply({"params": params}, jnp.asarray(ans_emb),
                  jnp.asarray(ocr_emb), jnp.asarray(prev), deterministic=True)
    )

    p = _query_params(params)
    # torch oracle of reference PrevPredEmbeddings.forward (sa_m4c.py:919-948)
    a = torch_layernorm_tf(t(ans_emb), t(p["ans_layer_norm"]["weight"]),
                           t(p["ans_layer_norm"]["bias"]))
    o = torch_layernorm_tf(t(ocr_emb), t(p["ocr_layer_norm"]["weight"]),
                           t(p["ocr_layer_norm"]["bias"]))
    cat = torch.cat([a.unsqueeze(0).expand(b, -1, -1), o], dim=1)
    flat = cat.reshape(b * (n_ans + n_ocr), d)
    offsets = (torch.arange(b) * (n_ans + n_ocr)).unsqueeze(-1)
    raw = torch.nn.functional.embedding(t(prev).long() + offsets, flat)
    pos_ids = torch.arange(t_len).unsqueeze(0).expand(b, t_len)
    pos = torch.nn.functional.embedding(pos_ids, t(p["position_embeddings"]))
    type_ids = (t(prev).long() >= n_ans).long()
    typ = torch.nn.functional.embedding(type_ids, t(p["token_type_embeddings"]))
    emb = torch_layernorm_tf(pos + typ, t(p["emb_layer_norm"]["weight"]),
                             t(p["emb_layer_norm"]["bias"]))
    ref = (raw + emb).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


def test_ocr_ptr_net_matches_torch():
    rng = np.random.RandomState(3)
    b, t_len, n_ocr, d, qk = 2, 5, 4, 32, 16
    dec = rng.randn(b, t_len, d).astype(np.float32)
    ocr = rng.randn(b, n_ocr, d).astype(np.float32)
    mask = (rng.rand(b, n_ocr) < 0.7).astype(np.float32)

    mod = OcrPtrNet(hidden_size=d, query_key_size=qk)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(dec),
                      jnp.asarray(ocr), jnp.asarray(mask))["params"]
    ours = np.asarray(
        mod.apply({"params": params}, jnp.asarray(dec), jnp.asarray(ocr),
                  jnp.asarray(mask))
    )
    p = _query_params(params)
    # torch oracle of reference OcrPtrNet.forward (sa_m4c.py:878-897)
    q = torch.nn.functional.linear(t(dec), t(p["query"]["weight"]), t(p["query"]["bias"]))
    kk = torch.nn.functional.linear(t(ocr), t(p["key"]["weight"]), t(p["key"]["bias"]))
    scores = torch.matmul(q, kk.transpose(-1, -2)) / math.sqrt(qk)
    ext = ((1.0 - t(mask)) * -10000.0).unsqueeze(1)
    ref = (scores + ext).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)
