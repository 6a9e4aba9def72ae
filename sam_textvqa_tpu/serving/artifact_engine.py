"""ServingEngine backed by an AOT decode artifact — zero-compile serving.

``ArtifactServingEngine`` is the deployment end of the AOT story
(serving/artifact.py): the full online engine (dynamic batching, bucket
padding, width-ladder routing, stats/SLOs, TCP endpoint via serve.py)
running entirely on DESERIALIZED StableHLO cells. A serving host needs
the artifact directory + an orbax checkpoint + the answer vocab — no
model hyperparameters, no flax module construction, no Python tracing
(the reference cannot do this at all: its eval requires the whole repo
importable, reference evaluator.py:28-63). The backend still compiles
the portable IR once per cell on first use; pair with --compile_cache
to skip that too on restarts (271 s -> 57 s warmup measured on chip,
SCALING.md "Artifact-backed serving").

Routing is read straight off the manifest: batch buckets and the
(obj x ocr) width ladders are whatever grid ``tools/export_decode.py``
froze. The engine's identical-answers contract carries over unchanged —
the exported cells are the SAME jitted functions the live engine warms up,
serialized (bit-parity proven in tests/test_artifact.py); auto-tuning is
refused because an artifact cannot compile new cells.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax

from .artifact import BATCH_KEYS, DecodeArtifact
from .engine import ServingEngine

logger = logging.getLogger(__name__)


class _MMTSpec:
    """The four shape fields the engine (and its ladder planner) reads off
    ``model.params_cfg.mmt``, lifted from the artifact manifest."""

    def __init__(self, m: Dict):
        self.max_seq_length = int(m["max_seq_length"])
        self.max_obj_num = int(m["max_obj_num"])
        self.max_ocr_num = int(m["max_ocr_num"])
        self.num_decoding_steps = int(m["num_decoding_steps"])


class _ParamsCfgSpec:
    def __init__(self, m: Dict):
        self.mmt = _MMTSpec(m)


class _ManifestModelSpec:
    """Duck-typed stand-in for the bits of SAM4C the engine touches:
    ``params_cfg.mmt`` (shapes) and ``dtype`` (submit-time feature cast).
    Everything about the decode itself lives in the serialized cells."""

    def __init__(self, m: Dict):
        import numpy as np

        self.params_cfg = _ParamsCfgSpec(m)
        # ml_dtypes registers 'bfloat16' with numpy under jax
        self.dtype = np.dtype(m.get("model_dtype") or "float32")


class ArtifactServingEngine(ServingEngine):
    """ServingEngine whose decode grid is a loaded ``DecodeArtifact``.

    Buckets and width ladders come FROM the manifest (they are the
    exported grid; overriding them could route to cells that don't
    exist). All other engine knobs (coalescing window, pipeline depth,
    beam handling, sharded ``device_put``) behave exactly as on the live
    engine. ``warmup`` runs each deserialized cell once — executables are
    already compiled, so it only settles runtime placement costs."""

    def __init__(
        self,
        artifact: DecodeArtifact,
        params,
        answer_vocab,
        *,
        max_wait_ms: float = 2.0,
        device_put=None,
        pipeline_depth: int = 2,
        max_queue: int = 4096,
    ):
        m = artifact.manifest
        buckets = sorted({c["batch"] for c in m["cells"]})
        obj = sorted(
            {c["obj_width"] for c in m["cells"] if c["obj_width"] is not None}
        )
        ocr = sorted(
            {c["ocr_width"] for c in m["cells"] if c["ocr_width"] is not None}
        )
        # the export is a full (bucket x obj x ocr) cross product; verify so
        # a hand-pruned artifact fails HERE, not mid-request in _cell_fn
        missing = [
            (b, ow, cw)
            for b in buckets
            for ow in (*obj, None)
            for cw in (*ocr, None)
            if (b, ow, cw) not in artifact.cells
        ]
        if missing:
            raise ValueError(
                f"artifact grid is not a full cross product; missing {missing}"
            )
        # the cells decode with the bos/eos BAKED IN at export time; if the
        # serving-side vocab disagrees, every answer would be decoded
        # against the wrong word list with no error — fail loudly instead
        # (the manifest records bos/eos exactly so consumers can check)
        special = answer_vocab.special_ids()
        if (int(m["bos"]), int(m["eos"])) != (special.bos, special.eos):
            raise ValueError(
                f"artifact was exported with bos={m['bos']} eos={m['eos']} "
                f"but the serving vocab has bos={special.bos} "
                f"eos={special.eos} — wrong --config/vocab for this artifact"
            )
        want_answers = m.get("num_answers")  # absent in pre-check manifests
        if want_answers is not None and int(want_answers) != len(answer_vocab):
            raise ValueError(
                f"artifact was exported with a {want_answers}-word answer "
                f"vocab but the serving vocab has {len(answer_vocab)} words "
                f"— wrong --config/vocab for this artifact"
            )
        self._artifact = artifact
        # one jit wrapper per cell: Exported.call re-stages on every plain
        # call; under jit it compiles (a cheap wrap of the deserialized
        # executable) once per cell and then dispatches like any jitted fn
        self._calls = {
            key: jax.jit(exp.call) for key, exp in artifact.cells.items()
        }
        super().__init__(
            _ManifestModelSpec(m),
            params,
            answer_vocab,
            buckets=buckets,
            max_wait_ms=max_wait_ms,
            decode_backend=m.get("backend", "xla"),
            device_put=device_put,
            pipeline_depth=pipeline_depth,
            max_queue=max_queue,
            beam_size=int(m.get("beam_size", 1)),
            ocr_buckets=ocr or None,
            obj_buckets=obj or None,
            auto_tune_every=0,  # cannot compile new cells from bytes
        )

    # ---- decode plumbing: manifest cells instead of jitted model fns ----

    def _cell_fn(self, obj_w, ocr_w):
        def fn(params, device_batch):
            rows = int(device_batch["question_indices"].shape[0])
            call = self._calls[(rows, obj_w, ocr_w)]
            return call(params, {k: device_batch[k] for k in BATCH_KEYS})

        return fn

    def _make_greedy(self, model):
        # full-width executor (greedy or beam — the cell already reduces
        # beams to (scores, best-beam rows) on device, artifact.py)
        return self._cell_fn(None, None)

    def _build_grid(self, obj_ladder, ocr_ladder, reuse=None) -> Dict:
        grid = {}
        for ow in (*obj_ladder, None):
            for cw in (*ocr_ladder, None):
                if (ow, cw) == (None, None):
                    continue
                grid[(ow, cw)] = self._cell_fn(ow, cw)
        return grid


def engine_from_artifact(
    artifact_dir: str, params, answer_vocab, **kwargs
) -> ArtifactServingEngine:
    """Load ``artifact_dir`` (tools/export_decode.py output) and wrap it in
    a ready-to-``warmup`` engine."""
    return ArtifactServingEngine(
        DecodeArtifact(artifact_dir), params, answer_vocab, **kwargs
    )
