"""Fast inference path: encoder-cached incremental decoding.

The reference's greedy eval re-runs TextBERT + the full 182-token MMT twelve
times per batch (reference sam/sa_m4c.py:285-302). The MMT is a prefix LM:
the 170 encoder positions (question/obj/OCR) can never attend to decoder
positions (their columns carry the -10000 bias, sa_m4c.py:793-845), so the
encoder side of every layer is decode-invariant.

This module runs the 6 MMT layers ONCE over the 170 encoder tokens, caches
each layer's encoder K/V, and per decode step processes only the 12 decoder
rows against [cached encoder K/V ; decoder K/V]. Per-step MMT compute drops
to ~12/182 of a full pass (~15x less over 12 steps).

Numerical equivalence to the full recompute: a key masked with the -10000
additive bias contributes exp(s - m - 10000) == 0.0 exactly in float32
(underflow), so excluding decoder keys from encoder rows (and future keys
from decoder rows) only removes exact zeros from the softmax sums. Verified
against the scan decoder in tests/test_fast_decode.py.

Implemented functionally over the flax param pytree (the same tensors the
module path uses) — a dedicated inference engine path, as production
serving stacks do.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MATRIX_TYPE_MAP, MMTConfig
from ..ops.spatial_graph import relation_head_lut
from .layers import MASK_BIAS, row_alive_from_bias


def _dense(p, x):
    return jnp.matmul(x, p["weight"].T.astype(x.dtype)) + p["bias"].astype(
        x.dtype
    )


def _qkv_fused(ap, x):
    """One (D, 3D) matmul for the Q/K/V projections. Three separate (D, D)
    dots cost 3x the dispatch overhead per decode step; the trace-time
    weight concat is params-only and CSE'd across unrolled steps."""
    w = jnp.concatenate(
        [ap["query"]["weight"], ap["key"]["weight"], ap["value"]["weight"]],
        axis=0,
    )  # (3D, D) torch layout
    b = jnp.concatenate(
        [ap["query"]["bias"], ap["key"]["bias"], ap["value"]["bias"]]
    )
    qkv = jnp.matmul(x, w.T.astype(x.dtype)) + b.astype(x.dtype)
    return jnp.split(qkv, 3, axis=-1)


def _layernorm(p, x, eps=1e-12):
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    s = jnp.square(xf - u).mean(-1, keepdims=True)
    y = p["weight"] * ((xf - u) / jnp.sqrt(s + eps)) + p["bias"]
    return y.astype(x.dtype)


def _gelu(x):
    # dtype-preserving like models/layers.gelu_erf: without the cast,
    # bf16 / f32-sqrt promotes the GeLU (and the FFN output matmul fed by
    # it) to f32 — diverging from the module forward and doubling the
    # second FFN matmul's bandwidth on the decode path
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _split_heads(x, h):
    b, l, d = x.shape
    return x.reshape(b, l, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def _attention(q, k, v, bias, zero_fully_masked):
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if zero_fully_masked:
        probs = probs * row_alive_from_bias(bias).astype(probs.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _ffn(lp, x, attn_out):
    inter = _gelu(_dense(lp["intermediate_dense"], x))
    out = _dense(lp["output_dense"], inter)
    return _layernorm(lp["output_LayerNorm"], out + attn_out)


class MMTCache(NamedTuple):
    """Per-layer encoder K/V + the final encoder hidden states."""

    enc_kv: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # [(B,H,Le,hd)]*L
    enc_out: jnp.ndarray       # (B, Le, D)
    enc_bias_cols: jnp.ndarray  # (B, 1, 1, Le) additive bias for enc keys
    ocr_mmt_in: jnp.ndarray
    spatial_dec_masked: Tuple[bool, ...]  # per layer: dec rows spatially cut
    # head-FLAT (B, Le, D) encoder K/V per layer for the fused pallas decode
    # kernel (ops/decode_attention.py); () unless built with store_flat
    enc_kv_flat: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...] = ()


def _enc_spatial_bias(classes, lut, col_bias, q_len, n_ctx, quadrants, h,
                      num_implicit=0):
    """(B, H, Le, Le) additive bias for encoder rows under a spatial (or
    implicit-augmented) layer (gather-free bitmask construction, see
    models/spatial.py)."""
    from .spatial import build_spatial_allowed

    allowed = build_spatial_allowed(
        classes, lut, question_len=q_len, decode_len=0,
        mask_quadrants=tuple(quadrants), num_spatial_heads=h,
        num_implicit_heads=num_implicit,
    )
    # f32 on purpose — a bf16 bias MEASURED SLOWER (3195 vs 3232
    # samples/s greedy @96): the construction fuses into its consumers
    # either way, and the extra converts cost more than the saved reads.
    bias = jnp.where(allowed, 0.0, MASK_BIAS)
    return jnp.minimum(bias, col_bias)  # combine with padding mask


def _iter_layer_params(cfg: MMTConfig, mmt_p):
    """Yield (layer_index, layer_type, layer_params) walking the
    normal_/spatial_/implicit_layer_<i> naming (reference layer_type_list
    interleaving, sa_m4c.py:738-752) — shared by every decode path."""
    counters = {"n": 0, "s": 0, "i": 0}
    names = {"n": "normal_layer_", "s": "spatial_layer_", "i": "implicit_layer_"}
    for li, layer_type in enumerate(cfg.layer_type_list):
        idx = counters[layer_type]
        counters[layer_type] += 1
        yield li, layer_type, mmt_p[f"{names[layer_type]}{idx}"]


def _layer_heads(cfg: MMTConfig, layer_type: str) -> int:
    """Per-layer head count (reference sa_m4c.py: normal layers use
    num_attention_heads, spatial layers num_spatial_relations, implicit
    layers num_spatial_relations + num_implicit_relations)."""
    if layer_type == "n":
        return cfg.num_attention_heads
    if layer_type == "s":
        return cfg.num_spatial_relations
    return cfg.num_spatial_relations + cfg.num_implicit_relations


def _dec_quadrant_bias(cfg: MMTConfig, layer_type: str, quadrants):
    """Per-head additive bias cutting decoder-ROW attention for spatial
    heads under quadrants 7/8/9 (reference sa_m4c.py:504-549: in the 3x3
    quadrant grid, 7 = dec rows x question cols, 8 = dec rows x obj+ocr
    cols, 9 = dec rows x dec cols; implicit heads are never
    quadrant-masked, matching models/spatial.py:build_spatial_allowed).

    Returns ``(enc_bias, dec_bias)`` as host float32 arrays of shape
    (H, Le) and (H, T) — 0 where attention is allowed, MASK_BIAS where a
    quadrant cuts it. Static (trace-time) data.
    """
    q_len = cfg.max_seq_length
    n_ctx = cfg.max_obj_num + cfg.max_ocr_num
    t_max = cfg.num_decoding_steps
    h = _layer_heads(cfg, layer_type)
    hs = cfg.num_spatial_relations
    spatial_head = np.arange(h) < hs  # (H,)
    le = q_len + n_ctx
    col = np.arange(le)
    enc_cut = np.zeros(le, dtype=bool)
    if 7 in quadrants:
        enc_cut |= col < q_len
    if 8 in quadrants:
        enc_cut |= col >= q_len
    dec_cut = np.full(t_max, 9 in quadrants, dtype=bool)
    enc_bias = np.where(spatial_head[:, None] & enc_cut[None], MASK_BIAS, 0.0)
    dec_bias = np.where(spatial_head[:, None] & dec_cut[None], MASK_BIAS, 0.0)
    return (
        enc_bias.astype(np.float32),
        dec_bias.astype(np.float32),
    )


def build_mmt_cache(
    params: Dict,
    cfg: MMTConfig,
    text_bert_emb,
    obj_mmt_in,
    ocr_mmt_in,
    question_mask,
    obj_mask,
    ocr_mask,
    spatial_classes,
    store_flat: bool = False,
) -> MMTCache:
    """Phase 1: one pass of the MMT layers over the encoder tokens.

    ``store_flat`` additionally keeps each layer's K/V in head-flat
    (B, Le, D) layout for the fused pallas decode kernel (the (B, H, Le,
    hd=64) layout pads the 64-lane head dim to 128 in HBM — flat blocks
    slice into (B, Le, 128) tiles with no padding waste)."""
    mmt_p = params["mmt"]
    q_len = cfg.max_seq_length
    n_ctx = spatial_classes.shape[-1]
    quadrants = tuple(cfg.attention_mask_quadrants)

    x = jnp.concatenate([text_bert_emb, obj_mmt_in, ocr_mmt_in], axis=1)
    col_mask = jnp.concatenate([question_mask, obj_mask, ocr_mask], axis=1)
    col_bias = ((1.0 - col_mask) * MASK_BIAS)[:, None, None, :]

    spatial_bias = {}

    def get_spatial_bias(key, num_implicit):
        # implicit layers carry extra always-on heads, so they need their
        # own bias even for the same context key
        cache_key = (key, num_implicit)
        if cache_key not in spatial_bias:
            spatial_bias[cache_key] = _enc_spatial_bias(
                spatial_classes,
                relation_head_lut(key),
                col_bias,
                q_len,
                n_ctx,
                quadrants,
                cfg.num_spatial_relations,
                num_implicit=num_implicit,
            )
        return spatial_bias[cache_key]

    enc_kv: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    enc_kv_flat: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    dec_spatial_cut = []
    for li, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        mix = cfg.mix_list[li]
        if layer_type == "n":
            bias = col_bias
            zero_rows = False
        elif layer_type == "s":
            bias = get_spatial_bias(MATRIX_TYPE_MAP[mix], 0)
            zero_rows = True
        else:
            bias = get_spatial_bias(
                MATRIX_TYPE_MAP[mix], cfg.num_implicit_relations
            )
            zero_rows = True
        h = _layer_heads(cfg, layer_type)
        ap = lp["attention_self"]
        # separate Q/K/V matmuls on purpose: _qkv_fused here MEASURED
        # SLOWER (3232 vs 3380 samples/s greedy @96) — at (B,170,768) the
        # three GEMMs are MXU-bound and the fused path pays a weight-concat
        # copy plus a 3-way output split. Fusion only wins on the
        # dispatch-bound one-row decode steps below.
        k_flat = _dense(ap["key"], x)
        v_flat = _dense(ap["value"], x)
        q = _split_heads(_dense(ap["query"], x), h)
        k = _split_heads(k_flat, h)
        v = _split_heads(v_flat, h)
        enc_kv.append((k, v))
        if store_flat:
            enc_kv_flat.append((k_flat, v_flat))
        ctx = _merge_heads(_attention(q, k, v, bias, zero_rows))
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)
        dec_spatial_cut.append(
            layer_type in ("s", "i")
            and any(quad in (7, 8, 9) for quad in quadrants)
        )

    return MMTCache(
        enc_kv=tuple(enc_kv),
        enc_out=x,
        enc_bias_cols=col_bias,
        ocr_mmt_in=ocr_mmt_in,
        spatial_dec_masked=tuple(dec_spatial_cut),
        enc_kv_flat=tuple(enc_kv_flat),
    )


def _dec_embedding(params, cfg: MMTConfig, classifier_weight, ocr_mmt_in, prev_inds):
    """PrevPredEmbeddings, functional (reference sa_m4c.py:900-948)."""
    pp = params["mmt"]["prev_pred_embeddings"]
    ans_num = classifier_weight.shape[0]
    b, t = prev_inds.shape
    ans_emb = _layernorm(pp["ans_layer_norm"], classifier_weight)
    ocr_emb = _layernorm(pp["ocr_layer_norm"], ocr_mmt_in).astype(ans_emb.dtype)
    # two-gather select instead of materializing the batch-broadcast
    # (B, vocab+OCR, D) table (see models/mmt.py PrevPredEmbeddings)
    prev = prev_inds.astype(jnp.int32)
    is_vocab = prev < ans_num
    from_vocab = jnp.take(ans_emb, jnp.where(is_vocab, prev, 0), axis=0)
    from_ocr = jnp.take_along_axis(
        ocr_emb, jnp.where(is_vocab, 0, prev - ans_num)[:, :, None], axis=1
    )
    raw = jnp.where(is_vocab[:, :, None], from_vocab, from_ocr)
    token_type_ids = (prev_inds >= ans_num).astype(jnp.int32)
    emb = pp["position_embeddings"][None, :t] + jnp.take(
        pp["token_type_embeddings"], token_type_ids, axis=0
    )
    emb = _layernorm(pp["emb_layer_norm"], emb)
    return raw + emb.astype(raw.dtype)


def decode_rows(
    params: Dict,
    cfg: MMTConfig,
    cache: MMTCache,
    classifier_weight,
    prev_inds,
    ocr_mask,
):
    """Phase 2: all decoder rows through the layers against cached enc K/V.

    prev_inds: (B', T) where B' may be B*beams — the cache is indexed by
    ``sample_map`` implicitly via broadcasting when B' == B; for beams,
    tile the cache first.

    Returns scores (B', T, num_answers + OCR).
    """
    mmt_p = params["mmt"]
    t_len = prev_inds.shape[1]
    b = prev_inds.shape[0]

    x = _dec_embedding(params, cfg, classifier_weight, cache.ocr_mmt_in, prev_inds)

    causal_ok = jnp.tril(jnp.ones((t_len, t_len), dtype=bool))
    dec_bias = jnp.where(causal_ok, 0.0, MASK_BIAS)[None, None]

    for li, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        h = _layer_heads(cfg, layer_type)
        ap = lp["attention_self"]
        q = _split_heads(_dense(ap["query"], x), h)
        k_dec = _split_heads(_dense(ap["key"], x), h)
        v_dec = _split_heads(_dense(ap["value"], x), h)
        k_enc, v_enc = cache.enc_kv[li]
        # decoder-row bias: enc cols by padding mask, dec cols causal;
        # spatial/implicit layers under quadrants 7/8/9 additionally cut
        # the spatial heads' decoder rows (per-head bias via minimum,
        # matching the reference's min mask combination, sa_m4c.py:568)
        # concat SCORES, not K/V: re-materializing the (B,H,Le,hd) encoder
        # cache per layer per step costs ~50 GB of HBM traffic per batch;
        # the score tensors are (B,H,T,*) and tiny. Math identical.
        hd = q.shape[-1]
        scale = jnp.asarray(1.0 / np.sqrt(hd), q.dtype)
        scores_enc = jnp.einsum("bhqd,bhkd->bhqk", q, k_enc) * scale
        scores_dec = jnp.einsum("bhqd,bhkd->bhqk", q, k_dec) * scale
        enc_cols = jnp.broadcast_to(
            cache.enc_bias_cols, (b, 1, t_len, k_enc.shape[2])
        )
        enc_bias_l, dec_bias_l = enc_cols, dec_bias
        if cache.spatial_dec_masked[li]:
            qe, qd_ = _dec_quadrant_bias(
                cfg, layer_type, tuple(cfg.attention_mask_quadrants)
            )
            enc_bias_l = jnp.minimum(enc_cols, jnp.asarray(qe)[None, :, None, :])
            dec_bias_l = jnp.minimum(dec_bias, jnp.asarray(qd_)[None, :, None, :])
        scores = jnp.concatenate(
            [scores_enc + enc_bias_l.astype(scores_enc.dtype),
             scores_dec + dec_bias_l.astype(scores_dec.dtype)], axis=-1
        )
        probs = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1
        ).astype(q.dtype)
        # decoder rows always see unmasked encoder columns in practice, but
        # keep the fully-masked-row zeroing for spatial layers for exact
        # parity with the full forward (reference sa_m4c.py:574-584)
        if layer_type in ("s", "i"):
            full_bias = jnp.concatenate(
                [jnp.broadcast_to(enc_bias_l, scores_enc.shape),
                 jnp.broadcast_to(dec_bias_l, scores_dec.shape)], axis=-1
            )
            probs = probs * row_alive_from_bias(full_bias).astype(
                probs.dtype
            )
        le = k_enc.shape[2]
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs[..., :le], v_enc
        ) + jnp.einsum("bhqk,bhkd->bhqd", probs[..., le:], v_dec)
        ctx = _merge_heads(ctx)
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)

    # output heads (classifier + pointer net over cached OCR outputs)
    ptr_keys = _ptr_keys(params, cfg, cache, ocr_mask, x.dtype)
    return _output_head(params, classifier_weight, ptr_keys, x)


def _prev_pred_tables(params, classifier_weight, ocr_mmt_in):
    """The step-invariant PrevPredEmbeddings tables: layernormed answer and
    OCR embeddings (reference sa_m4c.py:919-948). Hoisted out of the decode
    loop — recomputing the (vocab, D) layernorm per step costs ~15 MB of
    HBM churn x 12 steps for identical results (matters in the ROLLED beam
    scan, where XLA cannot CSE across iterations)."""
    pp = params["mmt"]["prev_pred_embeddings"]
    ans_emb = _layernorm(pp["ans_layer_norm"], classifier_weight)
    ocr_emb = _layernorm(pp["ocr_layer_norm"], ocr_mmt_in).astype(ans_emb.dtype)
    return ans_emb, ocr_emb


def _dec_row_embedding(params, cfg: MMTConfig, tables, ans_num, token, t):
    """PrevPredEmbeddings for ONE decoder row at position ``t``
    (reference sa_m4c.py:900-948, restricted to a single step)."""
    pp = params["mmt"]["prev_pred_embeddings"]
    ans_emb, ocr_emb = tables
    prev = token.astype(jnp.int32)  # (B,)
    is_vocab = prev < ans_num
    from_vocab = jnp.take(ans_emb, jnp.where(is_vocab, prev, 0), axis=0)
    from_ocr = jnp.take_along_axis(
        ocr_emb, jnp.where(is_vocab, 0, prev - ans_num)[:, None, None], axis=1
    )[:, 0]
    raw = jnp.where(is_vocab[:, None], from_vocab, from_ocr)  # (B, D)
    token_type = (prev >= ans_num).astype(jnp.int32)
    emb = jnp.take(pp["position_embeddings"], t, axis=0)[None] + jnp.take(
        pp["token_type_embeddings"], token_type, axis=0
    )
    emb = _layernorm(pp["emb_layer_norm"], emb)
    return (raw + emb.astype(raw.dtype))[:, None, :]  # (B, 1, D)


def _ptr_keys(params, cfg: MMTConfig, cache: MMTCache, ocr_mask, dtype):
    """Step-invariant OCR pointer-net inputs: the key projection of the
    cached OCR outputs and the additive OCR padding bias (reference
    OcrPtrNet, sa_m4c.py:866-897 — only the query side depends on the
    decode step). Hoisted out of the decode loop."""
    ocr_begin = cfg.max_seq_length + cfg.max_obj_num
    ocr_out = cache.enc_out[:, ocr_begin : ocr_begin + cfg.max_ocr_num]
    kd = _dense(params["ocr_ptr_net"]["key"], ocr_out.astype(dtype))
    ocr_bias = ((1.0 - ocr_mask) * MASK_BIAS).astype(dtype)
    return kd, ocr_bias


def _decode_one_row(params, cfg: MMTConfig, cache: MMTCache,
                    classifier_weight, ptr_keys, x, dec_kv, t):
    """One decoder row (B,1,D) through all layers against cached encoder K/V
    plus the growing decoder K/V buffers; returns (logits, new dec_kv).

    ``dec_kv``: per layer (k, v) of shape (B, H_layer, T, hd_layer);
    positions > t hold zeros and are masked out, so the buffers keep a
    fixed shape for scan. Head counts may differ per layer type.
    """
    mmt_p = params["mmt"]
    b = x.shape[0]
    t_max = cfg.num_decoding_steps
    # additive bias over the T decoder key slots: only positions <= t visible
    dec_col_bias = jnp.where(
        jnp.arange(t_max)[None, None, None, :] <= t, 0.0, MASK_BIAS
    )

    new_dec_kv = []
    for li, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        h = _layer_heads(cfg, layer_type)
        ap = lp["attention_self"]
        q_p, k_p, v_p = _qkv_fused(ap, x)
        q = _split_heads(q_p, h)       # (B,H,1,hd)
        k_row = _split_heads(k_p, h)   # (B,H,1,hd)
        v_row = _split_heads(v_p, h)
        k_buf, v_buf = dec_kv[li]
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_row.astype(k_buf.dtype), t, axis=2
        )
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_row.astype(v_buf.dtype), t, axis=2
        )
        new_dec_kv.append((k_buf, v_buf))
        k_enc, v_enc = cache.enc_kv[li]
        hd = q.shape[-1]
        scale = jnp.asarray(1.0 / np.sqrt(hd), q.dtype)
        scores_enc = jnp.einsum("bhqd,bhkd->bhqk", q, k_enc) * scale
        scores_dec = jnp.einsum("bhqd,bhkd->bhqk", q, k_buf) * scale
        enc_bias_l, dec_bias_l = cache.enc_bias_cols, dec_col_bias
        if cache.spatial_dec_masked[li]:
            # quadrants 7/8/9 cut the spatial heads' decoder rows
            qe, qd_ = _dec_quadrant_bias(
                cfg, layer_type, tuple(cfg.attention_mask_quadrants)
            )
            enc_bias_l = jnp.minimum(enc_bias_l, jnp.asarray(qe)[None, :, None, :])
            dec_bias_l = jnp.minimum(dec_bias_l, jnp.asarray(qd_)[None, :, None, :])
        scores = jnp.concatenate(
            [scores_enc + enc_bias_l.astype(scores_enc.dtype),
             scores_dec + dec_bias_l.astype(scores_dec.dtype)], axis=-1
        )
        probs = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1
        ).astype(q.dtype)
        # without decoder-row quadrant masking a decoder row always sees its
        # own (bias-0) position, so no zeroing is needed; under quadrants
        # 7/8/9 a spatial head's row CAN be fully masked — replicate the
        # reference's fully-masked-row zeroing (sa_m4c.py:574-584)
        if cache.spatial_dec_masked[li]:
            full_bias = jnp.concatenate(
                [jnp.broadcast_to(enc_bias_l, scores_enc.shape),
                 jnp.broadcast_to(dec_bias_l, scores_dec.shape)], axis=-1
            )
            probs = probs * row_alive_from_bias(full_bias).astype(
                probs.dtype
            )
        le = k_enc.shape[2]
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs[..., :le], v_enc
        ) + jnp.einsum("bhqk,bhkd->bhqd", probs[..., le:], v_buf)
        ctx = _merge_heads(ctx)
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)

    return (
        _output_head(params, classifier_weight, ptr_keys, x)[:, 0],
        tuple(new_dec_kv),
    )


def _decode_one_row_flat(params, cfg: MMTConfig, cache: MMTCache,
                         classifier_weight, ptr_keys, x, dec_kv, t):
    """One decoder row via head-FLAT K/V layouts: enc (B, Le, D), dec
    (B, T, D).

    The headed (B, H, Le, hd=64) cache layout pads hd to the TPU's 128
    lanes in HBM, doubling the dominant per-step read (the same layout
    observation that motivated ``store_flat`` for the pallas kernels).
    Here the per-head scores/contexts are expressed as bitcast reshapes of
    the flat buffers (minor-dim split D -> (H, hd)) plus fused elementwise
    multiply-reduce, so the encoder K/V streams through unpadded and no
    headed copy of it ever exists. Math identical to
    :func:`_decode_one_row` (same softmax/zeroing semantics; exact in f32,
    tests/test_fast_decode.py).

    MEASURED SLOWER on v5e: 2796 vs 3380 samples/s greedy @96 — the
    multiply-reduce runs on the VPU where the einsum path rides the MXU,
    and the saved HBM bytes don't cover the difference. Kept as the
    opt-in ``backend="xla_flat"`` A/B baseline (SCALING.md negative
    results)."""
    mmt_p = params["mmt"]
    b = x.shape[0]
    d = cfg.hidden_size
    t_max = cfg.num_decoding_steps
    # additive bias over the T decoder key slots: only positions <= t visible
    dec_col_bias = jnp.where(
        jnp.arange(t_max)[None, None, :] <= t, 0.0, MASK_BIAS
    )  # (1, 1, T)

    new_dec_kv = []
    for li, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        h = _layer_heads(cfg, layer_type)
        hd = d // h
        ap = lp["attention_self"]
        q_p, k_p, v_p = _qkv_fused(ap, x)  # (B, 1, D) each, head-flat
        k_buf, v_buf = dec_kv[li]          # (B, T, D) head-flat
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_p.astype(k_buf.dtype), t, axis=1
        )
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_p.astype(v_buf.dtype), t, axis=1
        )
        new_dec_kv.append((k_buf, v_buf))
        k_enc, v_enc = cache.enc_kv_flat[li]  # (B, Le, D)
        le = k_enc.shape[1]
        scale = jnp.asarray(1.0 / np.sqrt(hd), q_p.dtype)
        q4 = q_p.reshape(b, 1, h, hd)
        # (q * K) -> segment-reduce the minor hd slice per head: one
        # unpadded pass over the flat K; the (B, Le, H, hd) product never
        # materializes (fused into the reduce)
        scores_enc = (
            (q4 * k_enc.reshape(b, le, h, hd)).sum(-1).transpose(0, 2, 1)
            * scale
        )  # (B, H, Le)
        scores_dec = (
            (q4 * k_buf.reshape(b, t_max, h, hd).astype(q_p.dtype))
            .sum(-1).transpose(0, 2, 1) * scale
        )  # (B, H, T)
        enc_bias_l = cache.enc_bias_cols[:, 0]  # (B, 1, Le)
        dec_bias_l = dec_col_bias               # (1, 1, T)
        if cache.spatial_dec_masked[li]:
            # quadrants 7/8/9 cut the spatial heads' decoder rows
            qe, qd_ = _dec_quadrant_bias(
                cfg, layer_type, tuple(cfg.attention_mask_quadrants)
            )
            enc_bias_l = jnp.minimum(enc_bias_l, jnp.asarray(qe)[None])
            dec_bias_l = jnp.minimum(dec_bias_l, jnp.asarray(qd_)[None])
        scores = jnp.concatenate(
            [scores_enc + enc_bias_l.astype(scores_enc.dtype),
             scores_dec + jnp.broadcast_to(
                 dec_bias_l, scores_dec.shape
             ).astype(scores_dec.dtype)], axis=-1
        )  # (B, H, Le + T)
        probs = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1
        ).astype(q_p.dtype)
        if cache.spatial_dec_masked[li]:
            full_bias = jnp.concatenate(
                [jnp.broadcast_to(enc_bias_l, scores_enc.shape),
                 jnp.broadcast_to(dec_bias_l, scores_dec.shape)], axis=-1
            )
            probs = probs * row_alive_from_bias(full_bias).astype(
                probs.dtype
            )
        # ctx: per-head probs broadcast over the hd slice of the flat V —
        # again one unpadded pass per buffer
        pe = probs[..., :le].transpose(0, 2, 1)[..., None]  # (B, Le, H, 1)
        pd = probs[..., le:].transpose(0, 2, 1)[..., None]  # (B, T, H, 1)
        ctx = (pe * v_enc.reshape(b, le, h, hd)).sum(axis=1) + (
            pd * v_buf.reshape(b, t_max, h, hd).astype(q_p.dtype)
        ).sum(axis=1)  # (B, H, hd)
        ctx = ctx.reshape(b, 1, d)
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)

    return (
        _output_head(params, classifier_weight, ptr_keys, x)[:, 0],
        tuple(new_dec_kv),
    )


def _mega_supported(cfg: MMTConfig, cache: MMTCache) -> bool:
    """The per-step megakernel additionally needs one uniform head dim
    across layers (single static hd for the whole grid)."""
    if not _fused_supported(cfg, cache):
        return False
    return len({_layer_heads(cfg, lt) for lt in cfg.layer_type_list}) == 1


def _fused_supported(cfg: MMTConfig, cache: MMTCache) -> bool:
    """The pallas decode kernel covers hd | 128 head layouts and no
    decoder-row quadrant masking; anything else falls back to the XLA
    one-row path. Kernel-vs-XLA agreement is exact in f32 and argmax-level
    in bf16 (the kernel rounds k*q elementwise where XLA accumulates in
    f32 inside the MXU) — the bar the A/B backends are held to.

    Precondition (see _seg_lens): the kernels rebuild the encoder padding
    bias from per-segment valid COUNTS, so question/obj/OCR masks must be
    prefix-contiguous — true for everything the data pipeline emits."""
    d = cfg.hidden_size
    if d % 128 != 0 or any(cache.spatial_dec_masked):
        return False
    if not cache.enc_kv_flat:
        return False
    for lt in cfg.layer_type_list:
        h = _layer_heads(cfg, lt)
        if d % h != 0 or 128 % (d // h) != 0:
            return False
    return True


def _fused_step_consts(params, cfg: MMTConfig, cache: MMTCache, dtype):
    """Step-invariant tensors for the fused decode loop, computed ONCE
    before the 12 steps: pre-transposed+cast fused QKV weights per layer
    and the flat enc K/V pinned behind an optimization barrier. XLA fails
    to CSE these across steps when pallas custom calls sit between them
    (measured: 216 re-pads of the (2304, 768) weight concat and 54 layout
    copies of the 16.7 MB flat K/V per decode — ~1.7 GB of HBM churn)."""
    mmt_p = params["mmt"]
    weights = []
    for _, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        ap = lp["attention_self"]
        w = jnp.concatenate(
            [ap["query"]["weight"], ap["key"]["weight"], ap["value"]["weight"]],
            axis=0,
        ).T.astype(dtype)  # (D, 3D)
        bias = jnp.concatenate(
            [ap["query"]["bias"], ap["key"]["bias"], ap["value"]["bias"]]
        ).astype(dtype)
        weights.append((w, bias, lp))
    kv_flat = jax.lax.optimization_barrier(
        tuple((k.astype(dtype), v.astype(dtype)) for k, v in cache.enc_kv_flat)
    )
    return weights, kv_flat


def _decode_one_row_fused(params, cfg: MMTConfig, step_consts,
                          classifier_weight, ptr_keys, seg_lens, x, dec_kv,
                          t, interpret):
    """One decoder row through all layers with the fused pallas attention
    (ops/decode_attention.py). ``x``: (B, D) head-flat; ``dec_kv``: per
    layer (k, v) of shape (B, T, D) head-flat. Math identical to
    :func:`_decode_one_row` (verified in tests/test_decode_attention.py)."""
    from ..ops.decode_attention import decode_attention

    weights, kv_flat = step_consts
    d = cfg.hidden_size
    q_len = cfg.max_seq_length

    new_dec_kv = []
    for li, layer_type in enumerate(cfg.layer_type_list):
        w_qkv, b_qkv, lp = weights[li]
        h = _layer_heads(cfg, layer_type)
        qkv = jnp.matmul(x, w_qkv) + b_qkv
        q_p, k_p, v_p = jnp.split(qkv, 3, axis=-1)  # (B, D), head-flat
        k_buf, v_buf = dec_kv[li]
        k_buf = k_buf.at[:, t].set(k_p.astype(k_buf.dtype))
        v_buf = v_buf.at[:, t].set(v_p.astype(v_buf.dtype))
        new_dec_kv.append((k_buf, v_buf))
        k_enc, v_enc = kv_flat[li]
        ctx = decode_attention(
            q_p, k_enc, v_enc, k_buf, v_buf,
            seg_lens,
            hd=d // h, t=t, q_len=q_len, n_obj=cfg.max_obj_num,
            interpret=interpret,
        )
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)

    return (
        _output_head(params, classifier_weight, ptr_keys, x[:, None, :])[:, 0],
        tuple(new_dec_kv),
    )


def _output_head(params, classifier_weight, ptr_keys, x):
    """Classifier + OCR pointer-net scores for decoder rows ``x`` (B, T, D)
    (reference sa_m4c.py:866-897, :270-278)."""
    fixed = jnp.matmul(x, classifier_weight.T.astype(x.dtype)) + params[
        "classifier_bias"
    ].astype(x.dtype)
    pn = params["ocr_ptr_net"]
    qd = _dense(pn["query"], x)
    kd, ocr_bias = ptr_keys
    dk = qd.shape[-1]
    dyn = jnp.einsum("btd,bkd->btk", qd, kd) / jnp.asarray(np.sqrt(dk), x.dtype)
    dyn = dyn + ocr_bias[:, None, :].astype(x.dtype)
    return jnp.concatenate([fixed, dyn], axis=-1)


def _mega_step_consts(params, cfg: MMTConfig, cache: MMTCache, dtype):
    """Stacked (L, ...) weight tensors + (L, B, Le, D) enc K/V for the
    per-step megakernel (ops/decode_step.py). Built once per decode."""
    mmt_p = params["mmt"]
    cols = {k: [] for k in (
        "wqkv", "bqkv", "wout", "bout", "ln1w", "ln1b",
        "wff1", "bff1", "wff2", "bff2", "ln2w", "ln2b",
    )}
    for _, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        ap = lp["attention_self"]
        cols["wqkv"].append(jnp.concatenate(
            [ap["query"]["weight"], ap["key"]["weight"], ap["value"]["weight"]],
            axis=0,
        ).T.astype(dtype))
        cols["bqkv"].append(jnp.concatenate(
            [ap["query"]["bias"], ap["key"]["bias"], ap["value"]["bias"]]
        ).astype(dtype))
        op = lp["attention_output"]
        cols["wout"].append(op["dense"]["weight"].T.astype(dtype))
        cols["bout"].append(op["dense"]["bias"].astype(dtype))
        cols["ln1w"].append(op["LayerNorm"]["weight"].astype(jnp.float32))
        cols["ln1b"].append(op["LayerNorm"]["bias"].astype(jnp.float32))
        cols["wff1"].append(lp["intermediate_dense"]["weight"].T.astype(dtype))
        cols["bff1"].append(lp["intermediate_dense"]["bias"].astype(dtype))
        cols["wff2"].append(lp["output_dense"]["weight"].T.astype(dtype))
        cols["bff2"].append(lp["output_dense"]["bias"].astype(dtype))
        cols["ln2w"].append(lp["output_LayerNorm"]["weight"].astype(jnp.float32))
        cols["ln2b"].append(lp["output_LayerNorm"]["bias"].astype(jnp.float32))
    stacks = {k: jnp.stack(v) for k, v in cols.items()}
    # 1-D per-layer vectors ride as (L, 1, X): a (1, X) block satisfies the
    # TPU block-tiling rule (last two dims divisible by (8, 128) OR equal
    # to the array dims)
    for k, v in stacks.items():
        if v.ndim == 2:
            stacks[k] = v[:, None, :]
    k_enc = jnp.stack([k.astype(dtype) for k, _ in cache.enc_kv_flat])
    v_enc = jnp.stack([v.astype(dtype) for _, v in cache.enc_kv_flat])
    return stacks, k_enc, v_enc


def _seg_lens(batch, validate: bool = False):
    """(B, 128) f32 — per-sample valid counts of the question / obj / OCR
    segments, consumed by the pallas decode kernel.

    PRECONDITION: each mask is prefix-contiguous (1s then 0s) — true for
    everything the data pipeline emits. A non-contiguous mask reaching the
    opt-in fused/mega backends would silently diverge from the XLA path;
    ``validate=True`` (used by tests) asserts count == first-zero length.
    """
    b = batch["question_mask"].shape[0]
    masks = [
        batch["question_mask"].astype(jnp.float32),
        batch["pad_obj_mask"].astype(jnp.float32),
        batch["pad_ocr_mask"].astype(jnp.float32),
    ]
    if validate:
        for m in masks:
            arr = np.asarray(m)
            n = arr.shape[-1]
            first_zero = np.where(
                arr > 0, np.arange(1, n + 1)[None, :], 0
            ).max(-1)
            assert (arr.sum(-1) == first_zero).all(), (
                "fused/mega decode backends require prefix-contiguous masks"
            )
    lens = jnp.stack([m.sum(-1) for m in masks], axis=1)
    return jnp.zeros((b, 128), jnp.float32).at[:, :3].set(lens)


def _dec_row_embedding_beams(params, cfg: MMTConfig, tables, ans_num,
                             tokens, t):
    """(B, K) prev tokens -> (B, K, D) row embeddings at position ``t``,
    gathering OCR embeddings from the UNTILED (B, OCR, D) encoder output."""
    pp = params["mmt"]["prev_pred_embeddings"]
    ans_emb, ocr_emb = tables
    prev = tokens.astype(jnp.int32)  # (B, K)
    is_vocab = prev < ans_num
    from_vocab = jnp.take(ans_emb, jnp.where(is_vocab, prev, 0), axis=0)
    from_ocr = jnp.take_along_axis(
        ocr_emb, jnp.where(is_vocab, 0, prev - ans_num)[:, :, None], axis=1
    )
    raw = jnp.where(is_vocab[:, :, None], from_vocab, from_ocr)  # (B, K, D)
    token_type = (prev >= ans_num).astype(jnp.int32)
    emb = jnp.take(pp["position_embeddings"], t, axis=0)[None, None] + jnp.take(
        pp["token_type_embeddings"], token_type, axis=0
    )
    emb = _layernorm(pp["emb_layer_norm"], emb)
    return raw + emb.astype(raw.dtype)


def _decode_one_row_beams(params, cfg: MMTConfig, cache: MMTCache,
                          classifier_weight, ptr_keys, x, dec_kv, t):
    """Beam variant of :func:`_decode_one_row`: ``x`` is (B, K, D) — one
    decoder row per beam — and the UNTILED per-sample encoder cache is
    shared by all K beams via the query dimension (tiling enc K/V across
    beams costs K x the dominant HBM read per step; this shares it).

    ``dec_kv``: per layer (k, v) of shape (B, K, H_layer, T, hd_layer) —
    per-beam decoder histories (they differ across beams after reordering).
    """
    mmt_p = params["mmt"]
    b, kbeams, d = x.shape
    t_max = cfg.num_decoding_steps
    dec_col_bias = jnp.where(
        jnp.arange(t_max)[None, None, None, :] <= t, 0.0, MASK_BIAS
    )  # (1, 1, 1, T)

    new_dec_kv = []
    for li, layer_type, lp in _iter_layer_params(cfg, mmt_p):
        h = _layer_heads(cfg, layer_type)
        ap = lp["attention_self"]
        hd = d // h
        q_p, k_p, v_p = _qkv_fused(ap, x)
        q = q_p.reshape(b, kbeams, h, hd)
        k_row = k_p.reshape(b, kbeams, h, 1, hd)
        v_row = v_p.reshape(b, kbeams, h, 1, hd)
        k_buf, v_buf = dec_kv[li]
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_row.astype(k_buf.dtype), t, axis=3
        )
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_row.astype(v_buf.dtype), t, axis=3
        )
        new_dec_kv.append((k_buf, v_buf))
        k_enc, v_enc = cache.enc_kv[li]  # (B, H, Le, hd) — untiled
        scale = jnp.asarray(1.0 / np.sqrt(hd), q.dtype)
        # beams ride the query dim against the shared encoder keys
        scores_enc = jnp.einsum("bkhd,bhld->bkhl", q, k_enc) * scale
        scores_dec = jnp.einsum("bkhd,bkhtd->bkht", q, k_buf) * scale
        # enc_bias_cols: (B, 1, 1, Le) -> broadcast over (K, H)
        enc_bias_l, dec_bias_l = cache.enc_bias_cols, dec_col_bias
        if cache.spatial_dec_masked[li]:
            # quadrants 7/8/9 cut the spatial heads' decoder rows
            qe, qd_ = _dec_quadrant_bias(
                cfg, layer_type, tuple(cfg.attention_mask_quadrants)
            )
            enc_bias_l = jnp.minimum(
                enc_bias_l, jnp.asarray(qe)[None, None, :, :]
            )
            dec_bias_l = jnp.minimum(
                dec_bias_l, jnp.asarray(qd_)[None, None, :, :]
            )
        scores = jnp.concatenate(
            [scores_enc + enc_bias_l.astype(scores_enc.dtype),
             scores_dec + dec_bias_l.astype(scores_dec.dtype)], axis=-1
        )
        probs = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1
        ).astype(q.dtype)
        if cache.spatial_dec_masked[li]:
            # fully-masked spatial-head rows get zeroed (sa_m4c.py:574-584)
            full_bias = jnp.concatenate(
                [jnp.broadcast_to(enc_bias_l, scores_enc.shape),
                 jnp.broadcast_to(dec_bias_l, scores_dec.shape)], axis=-1
            )
            probs = probs * row_alive_from_bias(full_bias).astype(
                probs.dtype
            )
        le = k_enc.shape[2]
        ctx = jnp.einsum(
            "bkhl,bhld->bkhd", probs[..., :le], v_enc
        ) + jnp.einsum("bkht,bkhtd->bkhd", probs[..., le:], v_buf)
        ctx = ctx.reshape(b, kbeams, d)
        op = lp["attention_output"]
        attn_out = _layernorm(op["LayerNorm"], _dense(op["dense"], ctx) + x)
        x = _ffn(lp, attn_out, attn_out)

    # beams ride the "row" axis of the shared head: x is (B, K, D)
    return _output_head(params, classifier_weight, ptr_keys, x), tuple(new_dec_kv)


def _greedy_early_exit(params, cfg: MMTConfig, cache, classifier_weight,
                       tables, ans_num, ptr_keys, dtype, b: int,
                       bos_idx: int, eos_idx: int):
    """Greedy decode as a ``lax.while_loop`` that stops as soon as EVERY
    row in the batch has emitted EOS.

    The reference always runs all ``num_decoding_steps`` steps (reference
    sa_m4c.py:285-302 — a fixed ``for`` over 12 dec_steps); with a trained
    checkpoint TextVQA answers average ~2 words, so most batches finish in
    a fraction of the step budget and the remaining steps are pure waste.
    A dynamic trip count is data-dependent control flow, which is exactly
    what ``lax.while_loop`` exists for on TPU — every shape in the carry
    stays static; only the iteration count varies.

    Contract vs the fixed-step path: per row, ``pred_ids`` match exactly
    up to and including that row's first EOS (greedy decoding is causal:
    step t depends only on tokens < t, which are final once emitted);
    positions after the EXIT step are filled with a one-hot EOS score row,
    so downstream answer decoding (which stops at the first EOS) is
    bit-identical. Raw scores past the exit step are NOT computed — that
    is the point.

    Returns ``(scores, pred_ids, steps_run)``; ``steps_run`` is the number
    of loop iterations actually executed (a device scalar — tests assert
    it shrinks under EOS-biased params).
    """
    t_max = cfg.num_decoding_steps

    def kv_buf(layer_type):
        h = _layer_heads(cfg, layer_type)
        return (
            jnp.zeros((b, h, t_max, cfg.hidden_size // h), dtype),
            jnp.zeros((b, h, t_max, cfg.hidden_size // h), dtype),
        )

    dec_kv0 = tuple(kv_buf(lt) for lt in cfg.layer_type_list)
    # un-written steps argmax to EOS by construction: rows the loop never
    # reaches read as a one-hot EOS distribution (same dtype as the real
    # logits, so the return matches the fixed-step backend's)
    scores0 = jnp.zeros((b, t_max, ans_num + cache.ocr_mmt_in.shape[1]),
                        dtype)
    scores0 = scores0.at[:, :, eos_idx].set(1.0)
    carry0 = (
        jnp.zeros((), jnp.int32),                       # t
        jnp.full((b,), bos_idx, dtype=jnp.int32),       # prev token
        jnp.zeros((b,), jnp.bool_),                     # row emitted EOS
        dec_kv0,
        scores0,
    )

    def cond_fn(carry):
        t, _token, done, _kv, _scores = carry
        return jnp.logical_and(t < t_max, jnp.logical_not(jnp.all(done)))

    def body_fn(carry):
        t, token, done, dec_kv, scores = carry
        x = _dec_row_embedding(
            params, cfg, tables, ans_num, token, t
        ).astype(dtype)
        logits, dec_kv = _decode_one_row(
            params, cfg, cache, classifier_weight, ptr_keys, x, dec_kv, t
        )
        scores = jax.lax.dynamic_update_slice_in_dim(
            scores, logits[:, None, :].astype(scores.dtype), t, axis=1
        )
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.logical_or(done, token == eos_idx)
        return (t + 1, token, done, dec_kv, scores)

    t_final, _, _, _, scores = jax.lax.while_loop(cond_fn, body_fn, carry0)
    return scores, jnp.argmax(scores, axis=-1).astype(jnp.int32), t_final


def greedy_decode_fast(model, params, batch, bos_idx: int,
                       backend: str = "auto", eos_idx: int = None):
    """Greedy decode: encoder cache + true incremental decoding.

    Phase 1 runs the MMT once over the 170 encoder tokens (build_mmt_cache).
    Phase 2 processes ONE decoder row per step against cached encoder AND
    decoder K/V — each row's embedding and K/V depend only on its own
    (already-final) prev token, so computing it once is mathematically
    identical to the reference's 12 full-sequence recomputes
    (reference sa_m4c.py:285-302). ~12x less decode compute than even the
    cached-encoder multi-row variant.

    ``backend``: "xla" = pure-XLA one-row steps; "xla_early" = the same
    steps inside a ``lax.while_loop`` that exits once every row has
    emitted EOS (requires ``eos_idx``; per-row answers are identical, raw
    scores past the exit step are one-hot EOS filler — see
    :func:`_greedy_early_exit`); "fused" = pallas decode attention
    (ops/decode_attention.py; raises if the config is unsupported);
    "auto" currently resolves to "xla" — the per-layer fused kernel
    measured SLOWER on v5e (2025 vs 3277 samples/s: each pallas call
    stalls on its 33 MB enc-K/V DMA, where XLA overlaps the reads across
    neighboring fusions; see SCALING.md). It stays as an opt-in A/B
    baseline for the per-step megakernel.

    Same outputs as models.sa_m4c.greedy_decode (verified in tests).
    """
    from .sa_m4c import SAM4C

    if backend not in ("auto", "xla", "xla_early", "xla_flat", "fused",
                       "mega"):
        raise ValueError(
            f"unknown decode backend {backend!r} "
            "(expected auto | xla | xla_early | xla_flat | fused | mega)"
        )
    if backend == "xla_early" and eos_idx is None:
        raise ValueError("backend 'xla_early' requires eos_idx")
    cfg = model.params_cfg.mmt
    t_max = cfg.num_decoding_steps
    encodings = model.apply(
        {"params": params}, batch, method=SAM4C.encode, deterministic=True
    )
    cache = build_mmt_cache(
        params,
        cfg,
        encodings["text_bert_emb"],
        encodings["obj_mmt_in"],
        encodings["ocr_mmt_in"],
        batch["question_mask"].astype(jnp.float32),
        batch["pad_obj_mask"].astype(jnp.float32),
        batch["pad_ocr_mask"].astype(jnp.float32),
        batch["spatial_classes"],
        store_flat=backend in ("fused", "mega", "xla_flat"),
    )
    use_fused = backend == "fused" and _fused_supported(cfg, cache)
    use_mega = backend == "mega" and _mega_supported(cfg, cache)
    use_flat = backend == "xla_flat"  # pure XLA, no config restrictions
    if backend == "fused" and not use_fused:
        raise ValueError(
            "fused decode kernel unsupported for this config (needs "
            "hd | 128 head layouts and no decoder-row quadrant masking)"
        )
    if backend == "mega" and not use_mega:
        raise ValueError(
            "megakernel unsupported for this config (needs one uniform "
            "hd | 128 head layout and no decoder-row quadrant masking)"
        )
    b = batch["train_prev_inds"].shape[0]
    classifier_weight = params["classifier_weight"]
    ocr_mask = batch["pad_ocr_mask"].astype(jnp.float32)
    # decoder rows run in the MODEL dtype (bf16 in production): the weight
    # reads of the 12 tiny sequential steps dominate eval time, and the
    # parity bar vs the bf16 full forward is argmax agreement (the f32
    # tests run the whole model in f32, where this path is exact).
    # buffers are per layer: head counts differ across layer types.
    dtype = model.dtype
    tables = _prev_pred_tables(params, classifier_weight, cache.ocr_mmt_in)
    ans_num = classifier_weight.shape[0]
    ptr_keys = _ptr_keys(params, cfg, cache, ocr_mask, dtype)
    # pallas kernels only compile for TPU; CPU (tests) runs them interpreted
    interpret = jax.default_backend() == "cpu"
    seg_lens = _seg_lens(batch) if use_fused else None
    step_consts = (
        _fused_step_consts(params, cfg, cache, dtype) if use_fused else None
    )

    if use_mega:
        return _greedy_mega(
            params, batch, bos_idx, cfg, cache, classifier_weight,
            tables, ans_num, ptr_keys, dtype, interpret
        )

    if backend == "xla_early":
        scores, pred_ids, _steps = _greedy_early_exit(
            params, cfg, cache, classifier_weight, tables, ans_num,
            ptr_keys, dtype, b, bos_idx, eos_idx
        )
        return scores, pred_ids

    def kv_buf(layer_type):
        if use_fused or use_flat:
            # head-flat buffers (B, T, D) — unpadded in HBM
            shape = (b, t_max, cfg.hidden_size)
        else:
            h = _layer_heads(cfg, layer_type)
            shape = (b, h, t_max, cfg.hidden_size // h)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    dec_kv = tuple(kv_buf(lt) for lt in cfg.layer_type_list)

    # a PYTHON loop, not a scan: the 12 steps are tiny, so full unrolling
    # lets XLA overlap across steps (+2.4% measured vs the rolled scan:
    # 2741 -> 2807 samples/s on v5e; the beam variant measured SLOWER
    # unrolled — larger per-step working set — and keeps the rolled scan),
    # and a STATIC step index turns the K/V-buffer updates and the decode
    # column masking into static-shape ops (also required by the fused
    # pallas decode kernel).
    token = jnp.full((b,), bos_idx, dtype=jnp.int32)
    all_logits = []
    for t in range(t_max):
        x = _dec_row_embedding(
            params, cfg, tables, ans_num, token, t
        ).astype(dtype)
        if use_fused:
            logits, dec_kv = _decode_one_row_fused(
                params, cfg, step_consts, classifier_weight, ptr_keys,
                seg_lens, x[:, 0, :], dec_kv, t, interpret
            )
        elif use_flat:
            logits, dec_kv = _decode_one_row_flat(
                params, cfg, cache, classifier_weight, ptr_keys, x, dec_kv, t
            )
        else:
            logits, dec_kv = _decode_one_row(
                params, cfg, cache, classifier_weight, ptr_keys, x, dec_kv, t
            )
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        all_logits.append(logits)

    final_scores = jnp.stack(all_logits, axis=1)  # (B, T, V)
    return final_scores, jnp.argmax(final_scores, axis=-1).astype(jnp.int32)


def _greedy_mega(params, batch, bos_idx, cfg, cache,
                 classifier_weight, tables, ans_num, ptr_keys, dtype,
                 interpret):
    """Greedy decode driven by the per-step megakernel
    (ops/decode_step.py): one pallas call per step runs all MMT layers;
    only the row embedding, output head, and argmax stay in XLA."""
    from ..ops.decode_step import decode_step_fused

    t_max = cfg.num_decoding_steps
    b = batch["train_prev_inds"].shape[0]
    d = cfg.hidden_size
    num_layers = len(cfg.layer_type_list)
    hd = d // _layer_heads(cfg, cfg.layer_type_list[0])
    seg_lens = _seg_lens(batch)
    stacks, k_enc_all, v_enc_all = _mega_step_consts(params, cfg, cache, dtype)
    k_dec = jnp.zeros((num_layers, b, t_max, d), dtype)
    v_dec = jnp.zeros((num_layers, b, t_max, d), dtype)
    batch_tiles = 2 if b % 2 == 0 and b >= 16 else 1

    token = jnp.full((b,), bos_idx, dtype=jnp.int32)
    all_logits = []
    for t in range(t_max):
        x = _dec_row_embedding(
            params, cfg, tables, ans_num, token, t
        ).astype(dtype)[:, 0, :]
        x_out, k_dec, v_dec = decode_step_fused(
            jnp.full((1,), t, jnp.int32), seg_lens, x,
            stacks["wqkv"], stacks["bqkv"], stacks["wout"], stacks["bout"],
            stacks["ln1w"], stacks["ln1b"], stacks["wff1"], stacks["bff1"],
            stacks["wff2"], stacks["bff2"], stacks["ln2w"], stacks["ln2b"],
            k_enc_all, v_enc_all, k_dec, v_dec,
            hd=hd, q_len=cfg.max_seq_length, n_obj=cfg.max_obj_num,
            batch_tiles=batch_tiles,
            interpret=interpret,
        )
        logits = _output_head(
            params, classifier_weight, ptr_keys, x_out[:, None, :]
        )[:, 0]
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        all_logits.append(logits)

    final_scores = jnp.stack(all_logits, axis=1)
    return final_scores, jnp.argmax(final_scores, axis=-1).astype(jnp.int32)


def beam_search_decode_fast(
    model, params, batch, beam_size: int, bos_idx: int, eos_idx: int,
    early_exit: bool = False,
):
    """Beam search on the fast path: encoder cache computed once per sample
    and tiled across beams, then TRUE incremental decoding — one decoder row
    per step with per-step beam-reorder of the decoder K/V buffers (the slow
    path re-runs the full MMT per beam per step; round 1's fast path still
    recomputed all 12 decoder rows per step).

    ``early_exit``: run the steps in a ``lax.while_loop`` that stops once
    EVERY beam of every sample is done, then EOS-fill the unwritten
    positions. This is BIT-identical to the fixed-step scan (stronger than
    the greedy xla_early contract): once a beam is done its step scores
    collapse to {0 at EOS, -inf elsewhere}, so each further step appends
    EOS with unchanged totals, and with all beams done top_k sees one
    finite candidate per beam at already-descending scores — lax.top_k's
    lowest-index tie-break makes the reorder the identity. Proven in
    tests/test_fast_decode.py."""
    from .sa_m4c import SAM4C

    cfg = model.params_cfg.mmt
    t_max = cfg.num_decoding_steps
    b = batch["train_prev_inds"].shape[0]
    k = beam_size

    encodings = model.apply(
        {"params": params}, batch, method=SAM4C.encode, deterministic=True
    )
    cache = build_mmt_cache(
        params,
        cfg,
        encodings["text_bert_emb"],
        encodings["obj_mmt_in"],
        encodings["ocr_mmt_in"],
        batch["question_mask"].astype(jnp.float32),
        batch["pad_obj_mask"].astype(jnp.float32),
        batch["pad_ocr_mask"].astype(jnp.float32),
        batch["spatial_classes"],
    )
    # the encoder cache is NOT tiled across beams: all K beams of a sample
    # share it through the query dimension (_decode_one_row_beams), so the
    # dominant per-step HBM read (12 layers of enc K/V) is paid once
    ocr_mask = batch["pad_ocr_mask"].astype(jnp.float32)
    classifier_weight = params["classifier_weight"]
    dtype = model.dtype
    tables = _prev_pred_tables(params, classifier_weight, cache.ocr_mmt_in)
    ans_num = classifier_weight.shape[0]
    ptr_keys = _ptr_keys(params, cfg, cache, ocr_mask, dtype)

    def kv_buf(layer_type):
        h = _layer_heads(cfg, layer_type)
        shape = (b, k, h, t_max, cfg.hidden_size // h)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    dec_kv0 = tuple(kv_buf(lt) for lt in cfg.layer_type_list)

    seqs = jnp.zeros((b, k, t_max), dtype=jnp.int32).at[:, :, 0].set(bos_idx)
    beam_scores = jnp.zeros((b, k), dtype=jnp.float32)
    done = jnp.zeros((b, k), dtype=bool)
    neg_inf = -1e30

    def gather_beams(t5, prev_beam):
        """Reorder a (B, K, H, T, hd) buffer along the beam dim."""
        return jnp.take_along_axis(
            t5, prev_beam[:, :, None, None, None], axis=1
        )

    def step(carry, t):
        seqs, beam_scores, done, dec_kv = carry
        # the token at position t for every live beam (BOS at t == 0)
        tokens = jax.lax.dynamic_index_in_dim(
            seqs, t, axis=2, keepdims=False
        )  # (B, K)
        x = _dec_row_embedding_beams(
            params, cfg, tables, ans_num, tokens, t
        ).astype(dtype)
        logits, dec_kv = _decode_one_row_beams(
            params, cfg, cache, classifier_weight, ptr_keys, x, dec_kv, t
        )
        v = logits.shape[-1]
        step_scores = jax.nn.log_sigmoid(
            logits.astype(jnp.float32)
        ).reshape(b, k, v)
        done_row = jnp.full((v,), neg_inf).at[eos_idx].set(0.0)
        step_scores = jnp.where(done[:, :, None], done_row[None, None], step_scores)
        total = beam_scores[:, :, None] + step_scores
        total = jnp.where(
            (t == 0) & (jnp.arange(k)[None, :, None] > 0), neg_inf, total
        )
        values, indices = jax.lax.top_k(total.reshape(b, k * v), k)
        prev_beam = indices // v
        token_next = indices % v
        seqs = jnp.take_along_axis(seqs, prev_beam[:, :, None], axis=1)
        done = jnp.take_along_axis(done, prev_beam, axis=1)
        # the surviving beams' decoder K/V histories follow the reorder
        dec_kv = tuple(
            (gather_beams(kk, prev_beam), gather_beams(vv, prev_beam))
            for kk, vv in dec_kv
        )
        in_range = t + 1 < t_max
        write_pos = jnp.minimum(t + 1, t_max - 1)
        cur = jnp.take_along_axis(
            seqs, jnp.full((b, k, 1), write_pos), axis=2
        )[..., 0]
        new_col = jnp.where(in_range, token_next, cur)
        seqs = jax.vmap(lambda s, c: s.at[:, write_pos].set(c))(seqs, new_col)
        done = done | (token_next == eos_idx)
        return (seqs, values, done, dec_kv), None

    if not early_exit:
        (seqs, beam_scores, done, _), _ = jax.lax.scan(
            step, (seqs, beam_scores, done, dec_kv0), jnp.arange(t_max)
        )
        return seqs, beam_scores

    def cond_fn(carry):
        t, (_seqs, _scores, done, _kv) = carry
        return jnp.logical_and(t < t_max, jnp.logical_not(jnp.all(done)))

    def body_fn(carry):
        t, inner = carry
        inner, _ = step(inner, t)
        return (t + 1, inner)

    t_final, (seqs, beam_scores, done, _) = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.zeros((), jnp.int32),
                           (seqs, beam_scores, done, dec_kv0))
    )
    # the skipped steps would each have appended EOS (all beams done):
    # step t writes position t+1, so positions > t_final are EOS
    seqs = jnp.where(jnp.arange(t_max)[None, None, :] > t_final, eos_idx, seqs)
    return seqs, beam_scores
