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


def needed_width(pad_mask) -> int:
    """Narrowest slot width that holds every real token: last nonzero mask
    column + 1 (0 when fully padded). Accepts a (B, N) batch mask or a
    single (N,) sample mask. The shared routing primitive behind the
    evaluator's and the serving engine's width ladders (OCR and obj)."""
    m = np.asarray(pad_mask)
    m = m.reshape(-1, m.shape[-1])
    used = np.flatnonzero(m.any(axis=0))
    return int(used[-1]) + 1 if used.size else 0


#: OCR-named alias kept for the serving engine / external callers
needed_ocr_width = needed_width


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


def shrink_obj_batch(batch: Dict, n_obj: int, n_small: int) -> Dict:
    """Slice every obj-width array (and the obj rows/cols of the visual
    spatial matrix) down to ``n_small`` slots. Exactness mirrors
    ``shrink_ocr_batch``: dropped slots carry the -10000 additive bias
    (softmax weight exactly 0.0 in f32), obj tokens are never indexed by
    position in any output (only the OCR block feeds the pointer net), and
    the spatial bitmasks are pairwise — slicing keeps every kept-pair
    entry. ``batch`` may already be OCR-shrunk: the OCR block is whatever
    follows the first ``n_obj`` rows of ``spatial_classes``."""
    out = dict(batch)
    for k in ("pad_obj_features", "pad_obj_mask", "pad_obj_bboxes"):
        out[k] = batch[k][:, :n_small]
    sc = batch["spatial_classes"]
    keep = np.r_[0:n_small, n_obj:sc.shape[-1]]
    out["spatial_classes"] = np.ascontiguousarray(sc[:, keep][:, :, keep])
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

    def _bucket_model(self, obj_w: Optional[int], ocr_w: Optional[int]):
        """Same weights, narrower obj/OCR widths (None = full) — a
        shorter-sequence executable. Static-shape bucketing: the TPU answer
        to the dynamic shapes the reference never needed to care about on
        GPU (see models.sa_m4c.with_widths)."""
        from ..models.sa_m4c import with_widths

        return with_widths(self.model, n_obj=obj_w, n_ocr=ocr_w)

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

    @staticmethod
    def _normalize_ladder(bucket, max_width, axis: str):
        """``bucket`` (None, int, or sequence of ints) -> ascending tuple of
        rung widths, validated against the model's full ``max_width``.
        Delegates to the ONE canonical normalizer shared with the serving
        engine (serving/ladder.py:normalize_ladder) — the two copies
        previously diverged on ``bucket=0`` and used ``assert`` for
        CLI-derived input."""
        from ..serving.ladder import normalize_ladder

        return normalize_ladder(bucket, max_width, axis)

    def _width_grid(self, obj_bucket, ocr_bucket, make_fn):
        """Normalize the two ladders and build the (obj_w, ocr_w) -> fn
        routing grid via ``make_fn(obj_w, ocr_w)`` (None = full width on
        that axis; the (None, None) cell is the caller's full fn). jit
        compiles lazily, so grid cells no batch ever routes to cost
        nothing.

        Single-controller only: routing reads the process-local pad masks,
        so under multi-host DP different processes could pick different
        widths for the same global step and trace different executables,
        desyncing collectives. Guarded here rather than at the call sites
        so every ladder user inherits it."""
        mmt = self.model.params_cfg.mmt
        obj_l = self._normalize_ladder(obj_bucket, mmt.max_obj_num, "obj")
        ocr_l = self._normalize_ladder(ocr_bucket, mmt.max_ocr_num, "ocr")
        if (obj_l or ocr_l) and jax.process_count() > 1:
            raise ValueError(
                "width ladders route on host-local pad masks and require a "
                "single-process (single-controller) runtime; got "
                f"jax.process_count()={jax.process_count()}"
            )
        grid = {
            (ow, cw): make_fn(ow, cw)
            for ow in (*obj_l, None)
            for cw in (*ocr_l, None)
            if (ow, cw) != (None, None)
        }
        return obj_l, ocr_l, grid

    def _route_widths(self, batch, obj_l, ocr_l, grid, full_fn):
        """Pick the narrowest (obj, ocr) grid cell that holds every real
        token in ``batch`` (None = full on that axis; fall back to
        ``full_fn``), shrink the batch to it; returns (batch, fn)."""
        n_obj = self.model.params_cfg.mmt.max_obj_num

        def pick(ladder, mask_key):
            need = needed_width(batch[mask_key]) if ladder else None
            for w in ladder:
                if need <= w:
                    return w
            return None

        obj_w = pick(obj_l, "pad_obj_mask")
        ocr_w = pick(ocr_l, "pad_ocr_mask")
        if (obj_w, ocr_w) == (None, None):
            return batch, full_fn
        if ocr_w is not None:
            batch = shrink_ocr_batch(batch, n_obj, ocr_w)
        if obj_w is not None:
            batch = shrink_obj_batch(batch, n_obj, obj_w)
        return batch, grid[(obj_w, ocr_w)]

    # sequence-length slicing shared with the serving engine
    _shrink_ocr = staticmethod(shrink_ocr_batch)

    def run_split(
        self,
        params,
        batches,
        device_put=None,
        gt_answers_by_qid: Optional[Dict[int, List[str]]] = None,
        ocr_bucket=None,
        obj_bucket=None,
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

        ``obj_bucket``: same ladder on the obj-region axis (detectron box
        slots); composes with ``ocr_bucket`` as a routing grid.
        """
        greedy = self._greedy_fn()
        obj_l, ocr_l, grid = self._width_grid(
            obj_bucket,
            ocr_bucket,
            lambda ow, cw: self._greedy_fn(
                self._bucket_model(ow, cw), cache_tag=(ow, cw)
            ),
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
            batch, fn = self._route_widths(batch, obj_l, ocr_l, grid, greedy)
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
        obj_bucket=None,
    ) -> Dict:
        """Beam-search decode with the reference's full result schema.

        Every beam is decoded and (when ground truth exists) scored — the
        analogue of the reference's ``accuracies_df`` with one row per beam
        (reference evaluator.py:312-340) — and the per-question best beam by
        topkscore (reference :344-351, ``best_result_df``) provides the
        headline answer. Both the VQA soft metric and ANLS are reported
        (reference :88-93).

        ``ocr_bucket`` / ``obj_bucket``: same sequence-length bucketing as
        ``run_split`` — int or ladder of widths per axis; each batch
        beam-decodes on the narrowest executable that fits (identical
        answers)."""
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
        obj_l, ocr_l, grid = self._width_grid(
            obj_bucket,
            ocr_bucket,
            lambda ow, cw: make_beam_fn(self._bucket_model(ow, cw)),
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
            batch, fn = self._route_widths(batch, obj_l, ocr_l, grid, beam_fn)
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
