"""Evaluation driver: greedy / beam decode over a split, EvalAI-format
prediction dumps, VQA / STVQA / ANLS accuracy.

Reference: evaluator.py (run_model_no_beam :162-176, evaluate_no_beam
:52-63, beam path :67-160) and the metric dispatch in task_utils.py:60-67.
String-side work stays host-side keyed by batch position (no byte-tensor
round trips), and decoding runs as one jitted scan per batch.
"""

from __future__ import annotations

import json
import logging
import os
from collections import deque
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import SpecialIds, VocabDict
from .metrics import (
    OCRVQAAccuracyEvaluator,
    STVQAAccuracyEvaluator,
    STVQAANLSEvaluator,
    TextVQAAccuracyEvaluator,
    decode_predictions,
)

logger = logging.getLogger(__name__)


def _batch_qids(batch, host_only):
    """Per-row question identities, preferring the raw host-side ids
    (int for TextVQA, str for ST-VQA — reference evaluator.py:304-356 keeps
    real qids through eval; the device array only carries int surrogates)."""
    raw = host_only.get("_question_id_raw")
    if raw is not None:
        return [int(q) if isinstance(q, (int, np.integer)) else str(q)
                for q in raw]
    return [int(q) for q in np.asarray(batch["question_id"])]


METRIC_EVALUATORS = {
    "textvqa": TextVQAAccuracyEvaluator,
    "stvqa": STVQAAccuracyEvaluator,
    "ocrvqa": OCRVQAAccuracyEvaluator,
    "anls": STVQAANLSEvaluator,
}

#: eval pipelining: keep this many batches' decode results in flight —
#: jax dispatch is async, so the host decodes batch i's strings while the
#: device decodes batches i+1..i+depth (fetching happens in ``consume``)
PIPELINE_DEPTH = 2


def _pipelined(batches, dispatch, consume):
    """Run ``dispatch`` over every batch with at most ``PIPELINE_DEPTH``
    results in flight before ``consume``-ing the oldest. The np.asarray
    fetch lives in the consumer, so the device runs ahead of the host's
    string work. Shared by the greedy and beam split runners."""
    pending: deque = deque()
    for batch in batches:
        pending.append(dispatch(batch))
        while len(pending) > PIPELINE_DEPTH:
            consume(pending.popleft())
    while pending:
        consume(pending.popleft())

#: batch keys the decoder actually reads — training-only arrays (targets is
#: (B, T, vocab+OCR) ~ 23 MB/batch) are never shipped to device during eval
DECODE_KEYS = (
    "question_indices",
    "question_mask",
    "pad_obj_features",
    "pad_obj_mask",
    "pad_obj_bboxes",
    "pad_ocr_features",
    "pad_ocr_mask",
    "pad_ocr_bboxes",
    "ocr_fasttext",
    "ocr_phoc",
    "spatial_classes",
    "train_prev_inds",
)


def needed_ocr_width(pad_ocr_mask) -> int:
    """Narrowest OCR width that holds every real token: last nonzero mask
    column + 1 (0 when fully padded). Accepts a (B, N) batch mask or a
    single (N,) sample mask. The shared routing primitive behind the
    evaluator's and the serving engine's width ladders."""
    m = np.asarray(pad_ocr_mask)
    m = m.reshape(-1, m.shape[-1])
    used = np.flatnonzero(m.any(axis=0))
    return int(used[-1]) + 1 if used.size else 0


def shrink_ocr_batch(batch: Dict, n_obj: int, n_small: int) -> Dict:
    """Slice every OCR-width array (and the OCR tail of the visual
    spatial matrix — obj rows come first) down to ``n_small`` slots.
    Exact for batches whose rows all have <= n_small real OCR tokens:
    the dropped slots carry the -10000 additive bias, whose softmax
    contribution is exactly 0.0 in f32, so every SELECTION (argmax token,
    top-k beam choice) is identical (tests/test_evaluator.py). Raw logits
    are bit-identical on TPU as measured; on CPU, XLA's reduction
    lane-grouping shifts with sequence length, so accumulated beam scores
    can move by one f32 ulp. Shared by the evaluator's and the serving
    engine's sequence-length bucketing."""
    out = dict(batch)
    for k in ("pad_ocr_features", "pad_ocr_mask", "pad_ocr_bboxes",
              "ocr_fasttext", "ocr_phoc"):
        out[k] = batch[k][:, :n_small]
    vis = n_obj + n_small
    out["spatial_classes"] = batch["spatial_classes"][:, :vis, :vis]
    return out


class Evaluator:
    def __init__(
        self,
        model,
        answer_vocab: VocabDict,
        metric: str = "textvqa",
        fast_decode: bool = True,
        decode_backend: str = "auto",
    ):
        self.model = model
        self.answer_vocab = answer_vocab
        self.special = answer_vocab.special_ids()
        self.metric_evaluator = METRIC_EVALUATORS[metric]()
        # the cached-encoder incremental path covers every config:
        # implicit layers, per-layer head counts, and decoder-row quadrant
        # masking (7/8/9) are all handled in models/fast_decode.py
        self.fast_decode = fast_decode
        # "auto" (XLA one-row steps — fastest measured) or the opt-in
        # pallas kernels "fused"/"mega" (A/B baselines; SCALING.md)
        self.decode_backend = decode_backend
        # jitted decode fns keyed on (fast_decode, decode_backend) so
        # mutating either attribute after first use picks the right path
        self._greedy: Dict = {}

    def _greedy_fn(self, model=None, cache_tag=None):
        """Jitted greedy decode for ``model`` (default: the full-width
        model). ``cache_tag`` distinguishes shape variants (the OCR-bucket
        models) in the jit cache."""
        model = self.model if model is None else model
        key = (self.fast_decode, self.decode_backend, cache_tag)
        if key not in self._greedy:
            from ..models.fast_decode import greedy_decode_fast
            from ..models.sa_m4c import greedy_decode

            bos = self.special.bos
            if self.fast_decode:
                backend = self.decode_backend
                eos = self.special.eos

                def decode(model, params, batch, bos_idx):
                    return greedy_decode_fast(
                        model, params, batch, bos_idx, backend=backend,
                        eos_idx=eos,
                    )
            else:
                decode = greedy_decode

            @jax.jit
            def fn(params, device_batch):
                return decode(model, params, device_batch, bos)

            self._greedy[key] = fn
        return self._greedy[key]

    def _ocr_bucket_model(self, n_small: int):
        """Same weights, narrower OCR width — a (170 - 50 + n_small)-token
        executable. Static-shape bucketing: the TPU answer to the dynamic
        shapes the reference never needed to care about on GPU (see
        models.sa_m4c.with_ocr_width)."""
        from ..models.sa_m4c import with_ocr_width

        return with_ocr_width(self.model, n_small)

    def _transfer_batch(self, batch):
        """Host batch -> device arrays, shipping only DECODE_KEYS and
        down-casting the feature arrays to the model compute dtype first
        (bit-identical for bf16 models — the device's first touch is
        ``.astype(model_dtype)`` anyway — and half the transfer bytes;
        see data/prefetch.py:cast_features_for_transfer)."""
        from ..data.prefetch import cast_features_for_transfer

        picked = {k: batch[k] for k in DECODE_KEYS if k in batch}
        picked = cast_features_for_transfer(picked, self.model.dtype)
        # one device_put of the whole dict — per-leaf transfers pay a full
        # RPC round trip each on remote-attached TPUs (SCALING.md "Online
        # serving engine", rule 1)
        return jax.device_put(picked)

    def _bucket_ladder(self, ocr_bucket, make_fn):
        """Normalize ``ocr_bucket`` (int or sequence of ints) into an
        ascending list of (width, fn) rungs via ``make_fn(width)``.

        Single-controller only: routing reads the process-local
        ``pad_ocr_mask``, so under multi-host DP different processes could
        pick different widths for the same global step and trace different
        executables, desyncing collectives. Guarded here rather than at the
        call sites so every ladder user inherits it."""
        if ocr_bucket is None:
            return []
        if jax.process_count() > 1:
            raise ValueError(
                "ocr_bucket width ladders route on the host-local OCR mask "
                "and require a single-process (single-controller) runtime; "
                f"got jax.process_count()={jax.process_count()}"
            )
        widths = (
            (ocr_bucket,)
            if isinstance(ocr_bucket, (int, np.integer))
            else tuple(ocr_bucket)
        )
        ladder = []
        for w in sorted({int(w) for w in widths}):
            assert 0 < w < self.model.params_cfg.mmt.max_ocr_num, w
            ladder.append((w, make_fn(w)))
        return ladder

    def _route_bucket(self, batch, buckets, n_obj, full_fn):
        """Pick the narrowest ladder rung that holds every real OCR token
        in ``batch`` (fall back to ``full_fn``); returns (batch, fn)."""
        if buckets:
            needed = needed_ocr_width(batch["pad_ocr_mask"])
            for w, small_fn in buckets:
                if needed <= w:
                    return self._shrink_ocr(batch, n_obj, w), small_fn
        return batch, full_fn

    # sequence-length slicing shared with the serving engine
    _shrink_ocr = staticmethod(shrink_ocr_batch)

    def run_split(
        self,
        params,
        batches,
        device_put=None,
        gt_answers_by_qid: Optional[Dict[int, List[str]]] = None,
        ocr_bucket=None,
    ) -> Dict:
        """Greedy-decode every batch; returns accuracy + EvalAI predictions.

        ``batches`` yields host batch dicts (with ``_ocr_tokens``,
        ``_answers``, ``question_id`` and optionally ``_real_count``).
        ``gt_answers_by_qid`` supplies ground truth externally when the
        split carries none — the analogue of the reference's eval_df pickle
        join (reference evaluator.py:67-93, 304-356).

        ``ocr_bucket``: an OCR width (int) or a LADDER of widths (sequence
        of ints). Each batch routes to the narrowest compiled executable
        that holds every real OCR token in the batch, falling back to the
        full width (identical answers — see ``_shrink_ocr``). jit compiles
        lazily, so ladder rungs no batch ever needs cost nothing.
        """
        greedy = self._greedy_fn()
        n_obj = self.model.params_cfg.mmt.max_obj_num
        buckets = self._bucket_ladder(
            ocr_bucket,
            lambda w: self._greedy_fn(self._ocr_bucket_model(w), cache_tag=w),
        )
        all_preds: List[Dict] = []
        scored_preds: List[Dict] = []

        def consume(item):
            # jax dispatch is async: np.asarray here blocks only if the
            # device hasn't caught up, so host-side decoding of batch i
            # overlaps the device decoding of batches i+1..i+depth
            pred_ids, host_only, qids = item
            pred_ids = np.asarray(pred_ids)
            decoded = decode_predictions(
                pred_ids,
                host_only["_ocr_tokens"],
                self.answer_vocab.word_list,
                self.special.eos,
            )
            real = host_only.get("_real_count", pred_ids.shape[0])
            for i in range(real):
                entry = {
                    "question_id": qids[i],
                    "pred_answer": decoded[i]["pred_answer"],
                    "belongs_to": decoded[i]["belongs_to"],
                }
                gt = host_only["_answers"][i]
                if not gt and gt_answers_by_qid:
                    gt = gt_answers_by_qid.get(qids[i], [])
                if gt:
                    scored_preds.append({**entry, "gt_answers": list(gt)})
                all_preds.append(entry)

        def dispatch(batch):
            host_only = {k: v for k, v in batch.items() if k.startswith("_")}
            qids = _batch_qids(batch, host_only)
            batch, fn = self._route_bucket(batch, buckets, n_obj, greedy)
            device_batch = self._transfer_batch(batch)
            if device_put is not None:
                device_batch = device_put(device_batch)
            _, pred_ids = fn(params, device_batch)
            return pred_ids, host_only, qids

        _pipelined(batches, dispatch, consume)

        accuracy = None
        if scored_preds:
            accuracy, _ = self.metric_evaluator.eval_pred_list(scored_preds)
        return {
            "accuracy": accuracy,
            "predictions": all_preds,
            "num_scored": len(scored_preds),
        }

    def dump_evalai(self, result: Dict, out_path: str) -> str:
        """EvalAI-format JSON dump (reference evaluator.py:52-63)."""
        payload = [
            {"question_id": p["question_id"], "answer": p["pred_answer"]}
            for p in result["predictions"]
        ]
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(payload, f)
        logger.info("dumped %d predictions to %s", len(payload), out_path)
        return out_path

    def run_split_beam(
        self,
        params,
        batches,
        beam_size: int,
        gt_answers_by_qid: Optional[Dict[int, List[str]]] = None,
        early_exit: bool = False,
        device_put=None,
        ocr_bucket=None,
    ) -> Dict:
        """Beam-search decode with the reference's full result schema.

        Every beam is decoded and (when ground truth exists) scored — the
        analogue of the reference's ``accuracies_df`` with one row per beam
        (reference evaluator.py:312-340) — and the per-question best beam by
        topkscore (reference :344-351, ``best_result_df``) provides the
        headline answer. Both the VQA soft metric and ANLS are reported
        (reference :88-93).

        ``ocr_bucket``: same sequence-length bucketing as ``run_split`` —
        an int or ladder of OCR widths; each batch beam-decodes on the
        narrowest executable that fits (identical answers)."""
        from ..models.beam_search import beam_search_decode
        from ..models.fast_decode import beam_search_decode_fast

        bos, eos = self.special.bos, self.special.eos
        beam_impl = (
            beam_search_decode_fast if self.fast_decode else beam_search_decode
        )

        # early_exit: fast path only — stop the while_loop once every beam
        # is done; BIT-identical outputs (fast_decode.beam_search_decode_fast)
        kw = {"early_exit": True} if early_exit and self.fast_decode else {}

        def make_beam_fn(model):
            @jax.jit
            def beam_fn(p, device_batch):
                return beam_impl(
                    model, p, device_batch, beam_size, bos, eos, **kw
                )

            return beam_fn

        beam_fn = make_beam_fn(self.model)
        n_obj = self.model.params_cfg.mmt.max_obj_num
        buckets = self._bucket_ladder(
            ocr_bucket, lambda w: make_beam_fn(self._ocr_bucket_model(w))
        )

        all_preds: List[Dict] = []
        scored_preds: List[Dict] = []

        def consume(item):
            # async-dispatch pipeline (see run_split): host-side per-beam
            # decoding overlaps the device's beam search on later batches
            seqs, scores, host_only, qids = item
            seqs = np.asarray(seqs)      # (B, K, T) incl. BOS at 0
            scores = np.asarray(scores)  # (B, K)
            best = np.argmax(scores, axis=1)
            real = host_only.get("_real_count", seqs.shape[0])
            k = seqs.shape[1]
            for i in range(real):
                # decode ALL beams (reference accuracies_df, one row per
                # beam; BOS dropped like reference :333)
                decoded_all = decode_predictions(
                    seqs[i, :, 1:],
                    [host_only["_ocr_tokens"][i]] * k,
                    self.answer_vocab.word_list,
                    eos,
                )
                beams = [
                    {
                        "pred_answer": decoded_all[b]["pred_answer"],
                        "belongs_to": decoded_all[b]["belongs_to"],
                        "topkscore": float(scores[i, b]),
                        "pred_ids": seqs[i, b].tolist(),
                    }
                    for b in range(k)
                ]
                bi = int(best[i])
                entry = {
                    "question_id": qids[i],
                    "pred_answer": beams[bi]["pred_answer"],
                    "topkscore": beams[bi]["topkscore"],
                    "best_beam": bi,
                    "beams": beams,
                }
                gt = host_only["_answers"][i]
                if not gt and gt_answers_by_qid:
                    gt = gt_answers_by_qid.get(qids[i], [])
                if gt:
                    scored_preds.append({**entry, "gt_answers": list(gt)})
                all_preds.append(entry)

        def dispatch(batch):
            host_only = {k: v for k, v in batch.items() if k.startswith("_")}
            qids = _batch_qids(batch, host_only)
            batch, fn = self._route_bucket(batch, buckets, n_obj, beam_fn)
            device_batch = self._transfer_batch(batch)
            if device_put is not None:
                # sharded placement hook (e.g. a DP x TP mesh) — the beam
                # analogue of run_split's device_put
                device_batch = device_put(device_batch)
            seqs, scores = fn(params, device_batch)
            return seqs, scores, host_only, qids

        _pipelined(batches, dispatch, consume)

        accuracy = anls = None
        if scored_preds:
            accuracy, _ = self.metric_evaluator.eval_pred_list(scored_preds)
            anls, _ = STVQAANLSEvaluator().eval_pred_list(scored_preds)
            # per-beam accuracies (reference accuracies_df "accuracy" col)
            flat = [
                {"pred_answer": b["pred_answer"], "gt_answers": p["gt_answers"]}
                for p in scored_preds
                for b in p["beams"]
            ]
            _, flat_scores = self.metric_evaluator.eval_pred_list(flat)
            it = iter(flat_scores)
            for p in scored_preds:
                for b in p["beams"]:
                    b["accuracy"] = next(it)
        return {
            "accuracy": accuracy,
            "anls": anls,
            "predictions": all_preds,
            "num_scored": len(scored_preds),
        }
