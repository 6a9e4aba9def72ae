"""Serialized inference artifacts: ahead-of-time exported decode executables.

``jax.export`` lowers a jitted function to StableHLO bytes that deserialize
and run WITHOUT the model's Python code — the TPU-native analogue of a
TorchScript/ONNX deployment artifact (the reference ships none; its eval
needs the full repo importable, reference evaluator.py:28-63). A serving
host deploys three files: this artifact directory, the orbax checkpoint
(the exported functions take params as an argument, so weights stay
hot-swappable), and the answer vocab.

Each artifact directory holds one ``decode_b{B}[_o{OBJ}][_c{OCR}].stablehlo``
per exported (batch, obj-width, ocr-width) cell plus a ``manifest.json``
recording shapes, dtypes, decode settings, and the producing jax version.
Export records the target platforms (default: this process's backend plus
CPU, so artifacts exported on a TPU host also smoke-test locally).

Greedy cells return ``(scores, pred_ids)`` exactly like the engine's jitted
callables (serving/engine.py:_make_greedy); beam cells return the same
``(scores, pred)`` pair reduced to the best beam on device.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

logger = logging.getLogger(__name__)

MANIFEST = "manifest.json"
#: answer vocab embedded in the artifact dir (newline-delimited words,
#: VocabDict's on-disk format) — makes a TCP serving host fully
#: config-free: artifact + checkpoint is the whole deployment
VOCAB_FILE = "answer_vocab.txt"
_SUFFIX = ".stablehlo"

#: exactly the exported calling convention — extra batch keys (targets,
#: loss masks, host-side strings) are dropped at call time because
#: jax.export pins the input PYTREE STRUCTURE, not just avals
BATCH_KEYS = (
    "question_indices", "question_mask",
    "pad_obj_features", "pad_obj_mask", "pad_obj_bboxes",
    "pad_ocr_features", "pad_ocr_mask", "pad_ocr_bboxes",
    "ocr_fasttext", "ocr_phoc", "spatial_classes", "train_prev_inds",
)


def _cell_name(batch: int, obj_w: Optional[int], ocr_w: Optional[int]) -> str:
    name = f"decode_b{batch}"
    if obj_w is not None:
        name += f"_o{obj_w}"
    if ocr_w is not None:
        name += f"_c{ocr_w}"
    return name


def _zero_batch(mmt, batch: int, model_dtype) -> Dict[str, np.ndarray]:
    """A shape/dtype-defining device batch (mirrors engine._zero_sample
    stacked through engine._stack) — values are irrelevant, jax.export
    traces by avals. Features ride in the model's compute dtype, exactly
    like the live engine's submit-time cast (bit-identical — the model's
    first device op is ``.astype(model.dtype)``; SCALING.md serving
    rule 3)."""
    from ..data.prefetch import cast_features_for_transfer

    q, o, c = mmt.max_seq_length, mmt.max_obj_num, mmt.max_ocr_num
    zb = {
        "question_indices": np.zeros((batch, q), np.int32),
        "question_mask": np.zeros((batch, q), np.float32),
        "pad_obj_features": np.zeros((batch, o, 2048), np.float32),
        "pad_obj_mask": np.zeros((batch, o), np.float32),
        "pad_obj_bboxes": np.zeros((batch, o, 5), np.float32),
        "pad_ocr_features": np.zeros((batch, c, 2048), np.float32),
        "pad_ocr_mask": np.zeros((batch, c), np.float32),
        "pad_ocr_bboxes": np.zeros((batch, c, 5), np.float32),
        "ocr_fasttext": np.zeros((batch, c, 300), np.float32),
        "ocr_phoc": np.zeros((batch, c, 604), np.float32),
        "spatial_classes": np.zeros((batch, o + c, o + c), np.int8),
        "train_prev_inds": np.zeros(
            (batch, mmt.num_decoding_steps), np.int32
        ),
    }
    return cast_features_for_transfer(zb, model_dtype)


def _make_decode_fn(model, bos: int, eos: int, backend: str, beam_size: int):
    """The engine's decode contract as one exportable function of
    (params, batch). ``policy`` is a host-side dispatch over two
    executables, so artifacts pin the per-cell backend instead (the
    manifest records which)."""
    import jax.numpy as jnp

    from ..models.fast_decode import (
        beam_search_decode_fast,
        greedy_decode_fast,
    )

    if beam_size > 1:
        def fn(params, device_batch):
            seqs, scores = beam_search_decode_fast(
                model, params, device_batch, beam_size, bos, eos,
                early_exit=True,
            )
            best = jnp.argmax(scores, axis=1)
            pred = jnp.take_along_axis(
                seqs, best[:, None, None], axis=1
            )[:, 0, 1:]
            return scores, pred

        return fn

    def fn(params, device_batch):
        return greedy_decode_fast(
            model, params, device_batch, bos, backend=backend, eos_idx=eos
        )

    return fn


def default_platforms() -> Tuple[str, ...]:
    """This process's backend plus cpu (deduped, order preserved) — a
    TPU-exported artifact stays loadable on a CPU host for smoke tests."""
    native = jax.default_backend()
    return tuple(dict.fromkeys([native, "cpu"]))


def export_decode_artifact(
    model,
    params,
    out_dir: str,
    *,
    bos: int,
    eos: int,
    buckets: Sequence[int] = (1, 8, 32),
    obj_buckets: Sequence[int] = (),
    ocr_buckets: Sequence[int] = (),
    backend: str = "xla",
    beam_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
    answer_vocab=None,
) -> Dict:
    """Export the decode grid to ``out_dir`` and return the manifest.

    With ``answer_vocab`` (a VocabDict), its word list is embedded as
    ``answer_vocab.txt`` so the artifact serves without any config file
    (serve.py --artifact --port needs nothing else but the checkpoint).

    One serialized executable per (batch bucket) x (obj rung + full) x
    (ocr rung + full) cell — the same grid the live engine pre-compiles in
    warmup (engine._build_grid), frozen to bytes. Width rungs use the same
    mask-only-truncation construction (``with_widths``), so answers are
    identical to full width by the exact-zero-softmax argument
    (SCALING.md "Sequence-length bucketing").
    """
    from ..models.sa_m4c import with_widths

    platforms = tuple(platforms or default_platforms())
    os.makedirs(out_dir, exist_ok=True)
    mmt = model.params_cfg.mmt
    cells = []
    for ow in (None, *obj_buckets):
        for cw in (None, *ocr_buckets):
            cell_model = (
                model if (ow, cw) == (None, None)
                else with_widths(model, n_obj=ow, n_ocr=cw)
            )
            fn = _make_decode_fn(cell_model, bos, eos, backend, beam_size)
            cmmt = cell_model.params_cfg.mmt
            for b in sorted(set(int(x) for x in buckets)):
                name = _cell_name(b, ow, cw)
                exported = jax_export.export(
                    jax.jit(fn), platforms=platforms
                )(params, _zero_batch(cmmt, b, model.dtype))
                blob = exported.serialize()
                with open(os.path.join(out_dir, name + _SUFFIX), "wb") as f:
                    f.write(blob)
                cells.append(
                    {
                        "name": name,
                        "batch": b,
                        "obj_width": ow,
                        "ocr_width": cw,
                        "bytes": len(blob),
                    }
                )
                logger.info("exported %s (%d bytes)", name, len(blob))
    manifest = {
        "format": "sam_textvqa_tpu.decode_artifact.v1",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "backend": backend,
        "beam_size": beam_size,
        "bos": bos,
        "eos": eos,
        "num_answers": int(model.params_cfg.num_answers),
        "model_dtype": str(np.dtype(model.dtype).name)
        if model.dtype is not None else "float32",
        "max_seq_length": mmt.max_seq_length,
        "max_obj_num": mmt.max_obj_num,
        "max_ocr_num": mmt.max_ocr_num,
        "num_decoding_steps": mmt.num_decoding_steps,
        "cells": cells,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    if answer_vocab is not None:
        if len(answer_vocab) != manifest["num_answers"]:
            raise ValueError(
                f"answer_vocab has {len(answer_vocab)} words but the model "
                f"was built for {manifest['num_answers']}"
            )
        with open(os.path.join(out_dir, VOCAB_FILE), "w") as f:
            f.write("\n".join(answer_vocab.word_list) + "\n")
    return manifest


class DecodeArtifact:
    """Loaded artifact: routes a batch to the right deserialized cell.

    ``call(params, batch)`` picks the smallest exported (batch, obj, ocr)
    cell that fits, pads rows up to the cell's batch, and returns
    ``(scores, pred_ids)`` for the REAL rows only — mirroring the live
    engine's bucket+ladder routing without any model Python."""

    def __init__(self, path: str):
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.cells = {}
        for cell in self.manifest["cells"]:
            blob_path = os.path.join(path, cell["name"] + _SUFFIX)
            with open(blob_path, "rb") as f:
                self.cells[
                    (cell["batch"], cell["obj_width"], cell["ocr_width"])
                ] = jax_export.deserialize(bytearray(f.read()))

    def _pick(self, rows: int, obj_needed: int, ocr_needed: int):
        fits = [
            k for k in self.cells
            if k[0] >= rows
            and (k[1] is None or k[1] >= obj_needed)
            and (k[2] is None or k[2] >= ocr_needed)
        ]
        if not fits:
            have = sorted(
                self.cells, key=lambda k: (k[0], k[1] or -1, k[2] or -1)
            )
            raise ValueError(
                f"no exported cell fits rows={rows} obj={obj_needed} "
                f"ocr={ocr_needed}; have {have}"
            )
        # narrowest executable: smallest batch, then narrowest widths
        # (None = full width sorts last)
        full_o = self.manifest["max_obj_num"]
        full_c = self.manifest["max_ocr_num"]
        return min(
            fits,
            key=lambda k: (
                k[0],
                k[1] if k[1] is not None else full_o,
                k[2] if k[2] is not None else full_c,
            ),
        )

    def call(self, params, batch: Dict[str, np.ndarray]):
        from ..data.prefetch import cast_features_for_transfer
        from ..evaluation.evaluator import (
            needed_width,
            shrink_obj_batch,
            shrink_ocr_batch,
        )

        rows = batch["question_indices"].shape[0]
        # the CANONICAL routing primitive (last nonzero column + 1), same
        # as the live engine: counting nonzero slots instead would route a
        # non-contiguous pad mask (e.g. a client zeroed a rejected middle
        # slot in place) to a too-narrow cell and silently truncate the
        # real tokens past the gap
        obj_needed = needed_width(batch["pad_obj_mask"]) if rows else 0
        ocr_needed = needed_width(batch["pad_ocr_mask"]) if rows else 0
        b, ow, cw = self._pick(rows, obj_needed, ocr_needed)
        routed = {
            k: np.asarray(batch[k]) for k in BATCH_KEYS if k in batch
        }
        full_obj = self.manifest["max_obj_num"]
        # OCR first, then obj — shrink_obj_batch handles an already-
        # OCR-shrunk spatial matrix (the evaluator's _route_widths order)
        if cw is not None:
            routed = shrink_ocr_batch(routed, full_obj, cw)
        if ow is not None:
            routed = shrink_obj_batch(routed, full_obj, ow)
        if "train_prev_inds" not in routed:
            routed["train_prev_inds"] = np.zeros(
                (rows, int(self.manifest["num_decoding_steps"])), np.int32
            )
        if rows < b:
            routed = {
                k: np.concatenate(
                    [np.asarray(v),
                     np.zeros((b - rows,) + np.asarray(v).shape[1:],
                              np.asarray(v).dtype)],
                    axis=0,
                )
                for k, v in routed.items()
            }
        routed = cast_features_for_transfer(
            routed, np.dtype(self.manifest["model_dtype"])
        )
        scores, pred = self.cells[(b, ow, cw)].call(params, routed)
        return scores[:rows], pred[:rows]


def load_decode_artifact(path: str) -> DecodeArtifact:
    return DecodeArtifact(path)
