"""Whole-model numerics oracle: an independent torch implementation of the
complete SA-M4C forward (reference math: BertEmbeddings/TextBert, modality
encoders with F.normalize, spatial float-mask attention with min-combine and
entity zeroing, prefix-LM + causal masks, pointer net, tied classifier)
fed with the flax model's weights must reproduce the flax scores."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from sam_textvqa_tpu.config import task_config_from_dict
from sam_textvqa_tpu.data.synthetic import device_batch, make_batch
from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams
from sam_textvqa_tpu.ops.spatial_graph import (
    relation_head_lut,
    spatial_head_mask_from_classes,
)

NUM_ANSWERS = 40
H = 12  # = num_spatial_relations (the relation LUT is 12-wide)


def t(x):
    return torch.tensor(np.asarray(x, np.float32))


def ln(p, x, eps=1e-12):
    u = x.mean(-1, keepdim=True)
    s = (x - u).pow(2).mean(-1, keepdim=True)
    return t(p["weight"]) * ((x - u) / torch.sqrt(s + eps)) + t(p["bias"])


def lin(p, x):
    return F.linear(x, t(p["weight"]), t(p["bias"]))


def gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def attention(p, x, bias, heads, zero_fully_masked=False):
    b, l, d = x.shape
    hd = d // heads

    def split(v):
        return v.view(b, l, heads, hd).permute(0, 2, 1, 3)

    q, k, v = split(lin(p["query"], x)), split(lin(p["key"], x)), split(lin(p["value"], x))
    scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(hd) + bias
    probs = torch.nn.Softmax(dim=-1)(scores)
    if zero_fully_masked:
        alive = (bias.max(dim=-1, keepdim=True)[0] + 10000.0) / 10000.0
        probs = probs * alive
    ctx = torch.matmul(probs, v).permute(0, 2, 1, 3).contiguous().view(b, l, d)
    if "biases" in p:
        # learned shared output bias (reference sa_m4c.py:439-443, :600-603:
        # self.biases(0), an Embedding(1, hidden) lookup)
        ctx = ctx + t(p["biases"])
    return ctx


def bert_layer(p, x, bias, heads, zero_fully_masked=False):
    ctx = attention(p["attention_self"], x, bias, heads, zero_fully_masked)
    attn = ln(p["attention_output"]["LayerNorm"],
              lin(p["attention_output"]["dense"], ctx) + x)
    inter = gelu(lin(p["intermediate_dense"], attn))
    return ln(p["output_LayerNorm"], lin(p["output_dense"], inter) + attn)


def normalize(x):
    return x / x.norm(dim=-1, keepdim=True).clamp_min(1e-12)


def simple_classifier(p, x):
    """Linear -> GeLU -> LN -> Linear (reference SimpleClassifier,
    sa_m4c.py:1031-1042)."""
    return lin(p["dense1"], ln(p["ln"], gelu(lin(p["dense0"], x))))


def torch_aux_head(p, seq, mmt_cfg):
    """Aux spatial-relation head (reference _forward_aux,
    sa_m4c.py:316-347): pairwise origin x dest over the obj+ocr outputs,
    mul/add fusion, 12-way classifier."""
    q0 = mmt_cfg.max_seq_length
    x = seq[:, q0 : q0 + mmt_cfg.max_obj_num + mmt_cfg.max_ocr_num]
    origin = simple_classifier(p["origin_transform"], x).unsqueeze(2)
    dest = simple_classifier(p["dest_transform"], x).unsqueeze(1)
    fused = origin * dest if mmt_cfg.aux_spatial_fusion == "mul" else origin + dest
    return lin(p["spatial_classifier"], fused)


def torch_sam4c_forward(p, batch, mmt_cfg, tb_layers=3):
    q_len = mmt_cfg.max_seq_length
    dec_len = mmt_cfg.num_decoding_steps
    heads = mmt_cfg.num_spatial_relations

    # --- TextBert (reference sa_m4c.py:374-396) ---
    emb_p = p["text_bert"]["embeddings"]
    ids = t(batch["question_indices"]).long()
    x = (
        F.embedding(ids, t(emb_p["word_embeddings"]))
        + t(emb_p["position_embeddings"])[: ids.shape[1]].unsqueeze(0)
        + F.embedding(torch.zeros_like(ids), t(emb_p["token_type_embeddings"]))
    )
    x = ln(emb_p["LayerNorm"], x)
    q_bias = ((1.0 - t(batch["question_mask"])) * -10000.0)[:, None, None, :]
    for i in range(tb_layers):
        x = bert_layer(p["text_bert"][f"layer_{i}"], x, q_bias, heads)
    text_emb = x

    # --- obj/ocr encodings (reference :204-257) ---
    obj = normalize(t(batch["pad_obj_features"]))
    obj_in = ln(p["obj_feat_layer_norm"], lin(p["linear_obj_feat_to_mmt_in"], obj)) + ln(
        p["obj_bbox_layer_norm"],
        lin(p["linear_obj_bbox_to_mmt_in"], t(batch["pad_obj_bboxes"])[:, :, :4]),
    )
    ft = normalize(t(batch["ocr_fasttext"]))
    ph = normalize(t(batch["ocr_phoc"]))
    fc = normalize(t(batch["pad_ocr_features"]))
    b, n_ocr = fc.shape[:2]
    ocr_feat = torch.cat([ft, ph, fc, torch.zeros(b, n_ocr, 50)], dim=-1)
    ocr_in = ln(p["ocr_feat_layer_norm"], lin(p["linear_ocr_feat_to_mmt_in"], ocr_feat)) + ln(
        p["ocr_bbox_layer_norm"],
        lin(p["linear_ocr_bbox_to_mmt_in"], t(batch["pad_ocr_bboxes"])[:, :, :4]),
    )

    # --- PrevPredEmbeddings (reference :900-948) ---
    pp = p["mmt"]["prev_pred_embeddings"]
    cls_w = t(p["classifier_weight"])
    ans = ln(pp["ans_layer_norm"], cls_w)
    ocr_e = ln(pp["ocr_layer_norm"], ocr_in)
    n_ans = cls_w.shape[0]
    cat = torch.cat([ans.unsqueeze(0).expand(b, -1, -1), ocr_e], dim=1)
    prev = t(batch["train_prev_inds"]).long()
    offsets = (torch.arange(b) * cat.shape[1]).unsqueeze(-1)
    raw = F.embedding(prev + offsets, cat.reshape(-1, cat.shape[-1]))
    pos = F.embedding(
        torch.arange(dec_len).unsqueeze(0).expand(b, -1), t(pp["position_embeddings"])
    )
    typ = F.embedding((prev >= n_ans).long(), t(pp["token_type_embeddings"]))
    dec_emb = raw + ln(pp["emb_layer_norm"], pos + typ)

    # --- MMT (reference :782-862) ---
    seq = torch.cat([text_emb, obj_in, ocr_in, dec_emb], dim=1)
    length = seq.shape[1]
    col = torch.cat(
        [t(batch["question_mask"]), t(batch["pad_obj_mask"]),
         t(batch["pad_ocr_mask"]), torch.zeros(b, dec_len)], dim=1
    )
    base = col[:, None, None, :].repeat(1, 1, length, 1)
    causal = torch.tril(torch.ones(dec_len, dec_len))
    base[:, :, -dec_len:, -dec_len:] = causal
    base_bias = (1.0 - base) * -10000.0

    # spatial mask via the (oracled) one-hot + reference float-mask recipe
    onehot = np.asarray(
        spatial_head_mask_from_classes(
            jnp.asarray(batch["spatial_classes"]),
            relation_head_lut("3").astype(np.float32),
        )
    )
    n_ctx = onehot.shape[1]
    m = torch.ones(b, length, length, heads)
    m[:, q_len : q_len + n_ctx, q_len : q_len + n_ctx, :] = t(onehot)
    m[:, :q_len, :q_len, :heads] = 0.0               # quadrant 1
    m[:, :q_len, q_len : q_len + n_ctx, :heads] = 0  # quadrant 2
    sp_bias = ((1.0 - m) * -10000.0).permute(0, 3, 1, 2)
    combined = torch.min(base_bias, sp_bias)

    x = seq
    layer_specs = [("n", 0), ("n", 1), ("s", 0), ("s", 1), ("s", 2), ("s", 3)]
    for kind, idx in layer_specs:
        if kind == "n":
            x = bert_layer(p["mmt"][f"normal_layer_{idx}"], x, base_bias, heads)
        else:
            x = bert_layer(
                p["mmt"][f"spatial_layer_{idx}"], x, combined, heads,
                zero_fully_masked=True,
            )

    ocr_begin = q_len + mmt_cfg.max_obj_num
    ocr_out = x[:, ocr_begin : ocr_begin + mmt_cfg.max_ocr_num]
    dec_out = x[:, -dec_len:]

    fixed = F.linear(dec_out, cls_w, t(p["classifier_bias"]))
    pn = p["ocr_ptr_net"]
    qv = lin(pn["query"], dec_out)
    kv = lin(pn["key"], ocr_out)
    dyn = torch.matmul(qv, kv.transpose(-1, -2)) / math.sqrt(qv.shape[-1])
    dyn = dyn + ((1.0 - t(batch["pad_ocr_mask"])) * -10000.0).unsqueeze(1)
    scores = torch.cat([fixed, dyn], dim=-1)
    if mmt_cfg.use_aux_heads:
        return scores, torch_aux_head(p, x, mmt_cfg)
    return scores


def test_full_model_matches_torch_oracle():
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 3}}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        num_spatial_relations=H, num_attention_heads=H,
        max_obj_num=7, max_ocr_num=5, num_decoding_steps=4, max_seq_length=6,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=H
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch_np = device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    ours = np.asarray(
        model.apply({"params": params}, batch, deterministic=True)["scores"]
    )
    p = jax.tree.map(lambda v: np.asarray(v), params)
    ref = torch_sam4c_forward(p, batch_np, mmt, tb_layers=3).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("fusion", ["mul", "add"])
def test_full_model_use_bias_and_aux_heads_match_torch_oracle(fusion):
    """use_bias (learned spatial-attention output bias, reference
    sa_m4c.py:439-443) and the aux spatial head (reference :316-347) vs
    the torch transcription — closes the converter-coverage risk flagged
    in round 1 (those params previously had no numerics oracle)."""
    cfg = task_config_from_dict(
        {"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 3}}
    )
    mmt = dataclasses.replace(
        cfg.mmt, hidden_size=48, intermediate_size=96, ptr_query_size=48,
        num_spatial_relations=H, num_attention_heads=H,
        max_obj_num=7, max_ocr_num=5, num_decoding_steps=4, max_seq_length=6,
        use_bias=True, use_aux_heads=True, aux_spatial_fusion=fusion,
    )
    tb = dataclasses.replace(
        cfg.text_bert, hidden_size=48, intermediate_size=96, num_attention_heads=H
    )
    task = dataclasses.replace(cfg, mmt=mmt, text_bert=tb)
    model = SAM4C(params_cfg=SAM4CParams(mmt, tb, NUM_ANSWERS))
    batch_np = device_batch(make_batch(task, 2, num_answers_vocab=NUM_ANSWERS))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = model.init({"params": jax.random.PRNGKey(1)}, batch)["params"]
    p = jax.tree.map(lambda v: np.asarray(v), params)
    # randomize the zero-init bias/classifier leaves so the oracle actually
    # exercises them
    rng = np.random.RandomState(0)
    for i in range(4):
        ap = p["mmt"][f"spatial_layer_{i}"]["attention_self"]
        ap["biases"] = (
            ap["biases"] + rng.normal(0, 0.05, ap["biases"].shape)
        ).astype(np.float32)
    params2 = jax.tree.map(jnp.asarray, p)
    out = model.apply({"params": params2}, batch, deterministic=True)
    ref_scores, ref_aux = torch_sam4c_forward(p, batch_np, mmt, tb_layers=3)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), ref_scores.numpy(), rtol=3e-5, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["spatial_head_out"]), ref_aux.numpy(),
        rtol=3e-5, atol=3e-5,
    )
