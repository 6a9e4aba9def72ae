"""SA-M4C top-level model: TextBERT + modality encoders + MMT + output heads,
with greedy `lax.scan` decoding.

Reference: class SAM4C in sam/sa_m4c.py:20-371. Capability parity:

* object encoding — L2-normalized fc7 -> Linear+LN plus bbox4 -> Linear+LN,
  dropout (reference :204-219; the frcn "ImageEncoder" is an Identity in
  every shipped config, textvqa_encoders.py:17-33, so features pass through);
* OCR encoding — [fasttext300 | phoc604 | fc7 2048 | zeros50] each
  L2-normalized before concat, plus bbox path (reference :221-257 including
  the legacy all-zero order vectors :242);
* classifier + OCR pointer net, scores = [fixed; dynamic] (reference
  :270-278), with the classifier weight tied as the decoder's answer
  embedding table (reference :266);
* training forward teacher-forces ``train_prev_inds``; eval decodes greedily
  for ``num_decoding_steps`` with a full MMT recompute per step — identical
  semantics to the reference's Python loop (reference :280-302) but as a
  fixed-shape `jax.lax.scan`;
* optional aux spatial head (reference :173-177, :316-347).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import MMTConfig, TextBertConfig
from .bert import TextBert
from .layers import Dense, LayerNormTF, gelu_erf, l2_normalize
from .mmt import MMT, OcrPtrNet


class SAM4CParams(NamedTuple):
    """Bundles the two model configs plus the answer-vocab size (the
    reference reads the latter from the global registry at build time,
    sa_m4c.py:169)."""

    mmt: MMTConfig
    text_bert: TextBertConfig
    num_answers: int


class SimpleClassifier(nn.Module):
    """Linear -> GeLU -> LN -> Linear (reference sa_m4c.py:1031-1042)."""

    hid_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hid_dim, dtype=self.dtype, name="dense0")(x)
        x = gelu_erf(x)
        x = LayerNormTF(dtype=self.dtype, name="ln")(x)
        return Dense(self.out_dim, dtype=self.dtype, name="dense1")(x)


def with_widths(
    model: "SAM4C",
    n_obj: Optional[int] = None,
    n_ocr: Optional[int] = None,
) -> "SAM4C":
    """The SAME weights compiled at narrower obj/OCR slot counts (None =
    keep full width): no parameter depends on either slot count (Dense
    weights are per-feature, decoder position embeddings cover only the
    decode steps), so inputs whose rows all fit the narrow widths can run a
    shorter-sequence executable. Used by the evaluator's and serving
    engine's sequence-length bucketing (SCALING.md); exactness argument in
    evaluation.evaluator.shrink_ocr_batch / shrink_obj_batch."""
    import dataclasses

    pc = model.params_cfg
    repl = {}
    if n_obj is not None:
        repl["max_obj_num"] = n_obj
    if n_ocr is not None:
        repl["max_ocr_num"] = n_ocr
    small = pc._replace(mmt=dataclasses.replace(pc.mmt, **repl))
    return type(model)(
        params_cfg=small,
        dtype=model.dtype,
        attention_backend=model.attention_backend,
    )


def with_ocr_width(model: "SAM4C", n_small: int) -> "SAM4C":
    """``with_widths`` on the OCR axis only (kept as a public convenience;
    the evaluator and serving engine now build (obj, ocr) grid cells via
    ``with_widths`` directly)."""
    return with_widths(model, n_ocr=n_small)


class SAM4C(nn.Module):
    params_cfg: SAM4CParams
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"  # "xla" | "pallas" (see models/mmt.py)

    def setup(self):
        mmt_cfg = self.params_cfg.mmt
        tb_cfg = self.params_cfg.text_bert

        self.text_bert = TextBert(
            vocab_size=tb_cfg.vocab_size,
            hidden_size=tb_cfg.hidden_size,
            num_hidden_layers=tb_cfg.num_hidden_layers,
            num_heads=tb_cfg.num_attention_heads,
            intermediate_size=tb_cfg.intermediate_size,
            hidden_dropout_prob=tb_cfg.hidden_dropout_prob,
            attention_probs_dropout_prob=tb_cfg.attention_probs_dropout_prob,
            layer_norm_eps=tb_cfg.layer_norm_eps,
            dtype=self.dtype,
            name="text_bert",
        )
        # projection between TextBERT (768) and the MMT hidden size; Identity
        # when they match (reference sa_m4c.py:93-103)
        self.needs_text_proj = mmt_cfg.hidden_size != tb_cfg.hidden_size
        if self.needs_text_proj:
            self.text_bert_out_linear = Dense(
                mmt_cfg.hidden_size, dtype=self.dtype, name="text_bert_out_linear"
            )

        from .encoders import ImageEncoder

        # fc7 appearance encoders — Identity in every shipped config
        # (reference sa_m4c.py:29,105-140, textvqa_encoders.py:17-33)
        self.obj_faster_rcnn_fc7 = ImageEncoder(
            encoder_type=mmt_cfg.frcn_encoder_type, dtype=self.dtype,
            name="obj_faster_rcnn_fc7",
        )
        self.ocr_faster_rcnn_fc7 = ImageEncoder(
            encoder_type=mmt_cfg.frcn_encoder_type, dtype=self.dtype,
            name="ocr_faster_rcnn_fc7",
        )
        self.linear_obj_feat_to_mmt_in = Dense(
            mmt_cfg.hidden_size, dtype=self.dtype, name="linear_obj_feat_to_mmt_in"
        )
        self.linear_obj_bbox_to_mmt_in = Dense(
            mmt_cfg.hidden_size, dtype=self.dtype, name="linear_obj_bbox_to_mmt_in"
        )
        self.obj_feat_layer_norm = LayerNormTF(
            epsilon=mmt_cfg.layer_norm_eps, dtype=self.dtype,
            name="obj_feat_layer_norm",
        )
        self.obj_bbox_layer_norm = LayerNormTF(
            epsilon=mmt_cfg.layer_norm_eps, dtype=self.dtype,
            name="obj_bbox_layer_norm",
        )
        self.obj_drop = nn.Dropout(rate=mmt_cfg.obj_drop)

        self.linear_ocr_feat_to_mmt_in = Dense(
            mmt_cfg.hidden_size, dtype=self.dtype, name="linear_ocr_feat_to_mmt_in"
        )
        self.linear_ocr_bbox_to_mmt_in = Dense(
            mmt_cfg.hidden_size, dtype=self.dtype, name="linear_ocr_bbox_to_mmt_in"
        )
        self.ocr_feat_layer_norm = LayerNormTF(
            epsilon=mmt_cfg.layer_norm_eps, dtype=self.dtype,
            name="ocr_feat_layer_norm",
        )
        self.ocr_bbox_layer_norm = LayerNormTF(
            epsilon=mmt_cfg.layer_norm_eps, dtype=self.dtype,
            name="ocr_bbox_layer_norm",
        )
        self.ocr_drop = nn.Dropout(rate=mmt_cfg.ocr_drop)

        self.mmt = MMT(
            config=mmt_cfg,
            dtype=self.dtype,
            attention_backend=self.attention_backend,
            name="mmt",
        )
        self.ocr_ptr_net = OcrPtrNet(
            hidden_size=mmt_cfg.hidden_size,
            query_key_size=mmt_cfg.ptr_query_size,
            dtype=self.dtype,
            name="ocr_ptr_net",
        )
        # classifier declared as raw params (not a Dense submodule) because
        # its weight doubles as the decoder's answer embedding table
        # (weight tying, reference sa_m4c.py:266) and must be readable
        # before/independently of the classifier matmul.
        self.classifier_weight = self.param(
            "classifier_weight",
            nn.initializers.normal(0.02),
            (self.params_cfg.num_answers, mmt_cfg.hidden_size),
            jnp.float32,
        )
        self.classifier_bias = self.param(
            "classifier_bias",
            nn.initializers.zeros,
            (self.params_cfg.num_answers,),
            jnp.float32,
        )
        if mmt_cfg.use_aux_heads:
            self.origin_transform = SimpleClassifier(
                128, 32, dtype=self.dtype, name="origin_transform"
            )
            self.dest_transform = SimpleClassifier(
                128, 32, dtype=self.dtype, name="dest_transform"
            )
            self.spatial_classifier = Dense(
                12, dtype=self.dtype, name="spatial_classifier"
            )

    # ----- modality encoders (decode-invariant) -----

    def encode(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        """Compute everything that does not depend on ``prev_inds``.

        The reference recomputes these inside its greedy loop
        (sa_m4c.py:294-296); they are decode-invariant, so hoisting them out
        of the scan is bit-identical and saves ~12x their cost at eval.
        """
        mmt_cfg = self.params_cfg.mmt
        dt = self.dtype

        # objects (reference :204-219)
        obj_feat = self.obj_faster_rcnn_fc7(batch["pad_obj_features"].astype(dt))
        if mmt_cfg.normalize:
            obj_feat = l2_normalize(obj_feat)
        obj_bbox = batch["pad_obj_bboxes"][..., :4].astype(dt)  # drop area col
        obj_mmt_in = self.obj_feat_layer_norm(
            self.linear_obj_feat_to_mmt_in(obj_feat)
        ) + self.obj_bbox_layer_norm(self.linear_obj_bbox_to_mmt_in(obj_bbox))
        obj_mmt_in = self.obj_drop(obj_mmt_in, deterministic=deterministic)

        # OCR (reference :221-257)
        ocr_fasttext = batch["ocr_fasttext"].astype(dt)
        ocr_phoc = batch["ocr_phoc"].astype(dt)
        ocr_fc7 = self.ocr_faster_rcnn_fc7(batch["pad_ocr_features"].astype(dt))
        if mmt_cfg.normalize:
            ocr_fasttext = l2_normalize(ocr_fasttext)
            ocr_phoc = l2_normalize(ocr_phoc)
            ocr_fc7 = l2_normalize(ocr_fc7)
        b, n_ocr = ocr_fc7.shape[:2]
        order_vectors = jnp.zeros((b, n_ocr, 50), dtype=dt)  # legacy, all-zero
        if mmt_cfg.use_phoc_fasttext:
            ocr_feat = jnp.concatenate(
                [ocr_fasttext, ocr_phoc, ocr_fc7, order_vectors], axis=-1
            )
        else:
            ocr_feat = jnp.concatenate([ocr_fc7, order_vectors], axis=-1)
        ocr_bbox = batch["pad_ocr_bboxes"][..., :4].astype(dt)
        ocr_mmt_in = self.ocr_feat_layer_norm(
            self.linear_ocr_feat_to_mmt_in(ocr_feat)
        ) + self.ocr_bbox_layer_norm(self.linear_ocr_bbox_to_mmt_in(ocr_bbox))
        ocr_mmt_in = self.ocr_drop(ocr_mmt_in, deterministic=deterministic)

        # question (reference :259-262)
        text_bert_out = self.text_bert(
            batch["question_indices"],
            batch["question_mask"].astype(dt),
            deterministic=deterministic,
        )
        if self.needs_text_proj:
            text_bert_out = self.text_bert_out_linear(text_bert_out)

        return {
            "text_bert_emb": text_bert_out,
            "obj_mmt_in": obj_mmt_in,
            "ocr_mmt_in": ocr_mmt_in,
        }

    def decode_step(
        self,
        encodings: Dict[str, jnp.ndarray],
        batch: Dict[str, jnp.ndarray],
        prev_inds: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """One MMT + output-heads pass for given previous predictions."""
        dt = self.dtype
        mmt_out = self.mmt(
            encodings["text_bert_emb"],
            encodings["obj_mmt_in"],
            encodings["ocr_mmt_in"],
            self.classifier_weight,
            prev_inds,
            batch["question_mask"].astype(dt),
            batch["pad_obj_mask"].astype(dt),
            batch["pad_ocr_mask"].astype(dt),
            batch["spatial_classes"],
            deterministic=deterministic,
        )
        fixed_scores = (
            jnp.matmul(
                mmt_out["mmt_dec_output"],
                self.classifier_weight.T.astype(dt),
            )
            + self.classifier_bias.astype(dt)
        )
        dynamic_scores = self.ocr_ptr_net(
            mmt_out["mmt_dec_output"],
            mmt_out["mmt_ocr_output"],
            batch["pad_ocr_mask"].astype(dt),
        )
        scores = jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)
        out = dict(mmt_out)
        out["scores"] = scores
        return out

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Training-mode forward: teacher-forced on train_prev_inds."""
        encodings = self.encode(batch, deterministic)
        out = self.decode_step(
            encodings, batch, batch["train_prev_inds"], deterministic
        )
        if self.params_cfg.mmt.use_aux_heads:
            out["spatial_head_out"] = self._aux_head(out["mmt_seq_output"])
        return out

    def _aux_head(self, mmt_seq_output):
        """Pairwise relation classifier over obj+ocr outputs
        (reference :316-347; fusion 'mul' or 'add')."""
        cfg = self.params_cfg.mmt
        q0 = cfg.max_seq_length
        q1 = q0 + cfg.obj_ocr_length
        x = mmt_seq_output[:, q0:q1]
        origin = self.origin_transform(x)[:, :, None, :]
        dest = self.dest_transform(x)[:, None, :, :]
        if cfg.aux_spatial_fusion == "mul":
            fused = origin * dest
        elif cfg.aux_spatial_fusion == "add":
            fused = origin + dest
        else:
            raise ValueError(cfg.aux_spatial_fusion)
        return self.spatial_classifier(fused)


def greedy_decode(
    model: SAM4C,
    params,
    batch: Dict[str, jnp.ndarray],
    bos_idx: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy eval decoding as a fixed-shape scan.

    Reproduces the reference eval loop (sa_m4c.py:285-302): prev_inds starts
    as [BOS, 0, ..., 0]; each step runs the full MMT and shifts the argmax
    into prev_inds[:, 1:]. Returns (final scores (B,T,V+O), pred ids (B,T)).
    """
    num_steps = model.params_cfg.mmt.num_decoding_steps

    encodings = model.apply(
        {"params": params}, batch, method=SAM4C.encode, deterministic=True
    )
    b = batch["train_prev_inds"].shape[0]
    prev_inds = jnp.zeros((b, num_steps), dtype=jnp.int32)
    prev_inds = prev_inds.at[:, 0].set(bos_idx)

    def step(prev_inds, _):
        out = model.apply(
            {"params": params},
            encodings,
            batch,
            prev_inds,
            method=SAM4C.decode_step,
            deterministic=True,
        )
        scores = out["scores"]
        argmax_inds = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        new_prev = prev_inds.at[:, 1:].set(argmax_inds[:, :-1])
        return new_prev, scores

    prev_inds, all_scores = jax.lax.scan(step, prev_inds, None, length=num_steps)
    final_scores = all_scores[-1]
    pred_ids = jnp.argmax(final_scores, axis=-1).astype(jnp.int32)
    return final_scores, pred_ids
