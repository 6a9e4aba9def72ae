"""Dynamic-batching serving engine for SA-M4C greedy decoding.

Design (TPU-first):

* **Fixed-shape buckets.** XLA compiles one executable per input shape, so
  the engine never pads to "the current batch size" — it rounds each
  coalesced batch up to the nearest of a small set of bucket sizes
  (default 1/8/32), all pre-compiled by :meth:`ServingEngine.warmup`.
  Padding rows replicate a real row; only real rows are answered.
* **Coalescing.** One batcher thread blocks on the request queue, then
  soaks up whatever else arrives within ``max_wait_ms`` (or until the
  largest bucket fills). Under load the wait never triggers — the queue
  already holds a full bucket; at low load a single request pays at most
  ``max_wait_ms`` extra.
* **Pipelining.** jax dispatch is async: the batcher enqueues device work
  and hands the un-fetched result to a consumer thread, so the host-side
  string decode of batch *i* overlaps the device decode of batch *i+1*
  (same depth-2 structure as evaluation.evaluator._pipelined).
* **Transfer diet.** Feature arrays are down-cast to the model compute
  dtype at ``submit`` time — on the caller's thread, so the cast is
  parallel across clients and the batcher stacks half the bytes
  (bit-identical for bf16 models — the device's first op on them is
  ``.astype``; data/prefetch.py). The stacked batch then ships as ONE
  ``device_put`` of the whole pytree: on remote-attached TPUs each
  separate transfer pays a full round trip, so one put per batch (not 13)
  is the difference between ~60 ms and ~500 ms per batch over a tunnel.

The reference has no serving layer (offline batch eval only,
reference evaluator.py:52-63); the per-request preprocessing helper
:func:`build_sample` mirrors its dataset-time featurization
(reference textvqa_dataset.py:285-334, processors.py:96-102,407-441).
"""

from __future__ import annotations

import logging
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from queue import Empty, Full, Queue
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prefetch import cast_features_for_transfer
from ..data.vocab import VocabDict
from ..evaluation.metrics import decode_predictions
from .ladder import normalize_ladder

logger = logging.getLogger(__name__)

#: per-sample array schema (unbatched shapes) the decoder consumes;
#: everything else in a request dict is host-side metadata.
SAMPLE_KEYS = (
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
)


def build_sample(
    task_cfg,
    question_indices: np.ndarray,
    question_mask: np.ndarray,
    obj_features: np.ndarray,
    obj_boxes: np.ndarray,
    ocr_tokens: Sequence[str],
    ocr_features: np.ndarray,
    ocr_boxes: np.ndarray,
    fasttext=None,
) -> Dict:
    """Featurize one raw request into the fixed-shape sample schema.

    Performs at request time what the offline pipeline does per dataset
    entry: pad/truncate regions (reference textvqa_dataset.py:285-305),
    PHOC + fastText OCR features (reference processors.py:407-441,96-102),
    and the spatial relation graph over the padded obj+ocr boxes
    (reference textvqa_dataset.py:228-266).

    Args:
      question_indices/question_mask: (Q,) pre-tokenized question (use
        data.processors.BertQuestionProcessor upstream).
      obj_features/ocr_features: (n, 2048) Faster-R-CNN fc7 rows.
      obj_boxes/ocr_boxes: (n, 5) normalized [x1,y1,x2,y2,area].
      ocr_tokens: raw OCR strings (cleaned + truncated here).
      fasttext: optional data.processors.FastTextProcessor; hash-fallback
        vectors are used when absent.
    """
    from ..data.features import pad_features
    from ..data.processors import FastTextProcessor, word_cleaner
    from ..ops.phoc import build_phoc_batch
    from ..ops.spatial_graph import build_spatial_graph

    mmt = task_cfg.mmt
    of, om, ob = pad_features(
        np.asarray(obj_features, np.float32),
        np.asarray(obj_boxes, np.float32),
        mmt.max_obj_num,
    )
    cf, cm, cb = pad_features(
        np.asarray(ocr_features, np.float32),
        np.asarray(ocr_boxes, np.float32),
        mmt.max_ocr_num,
    )
    cleaned = [word_cleaner(w) for w in ocr_tokens][: mmt.max_ocr_num]
    phoc = np.zeros((mmt.max_ocr_num, 604), np.float32)
    ft = np.zeros((mmt.max_ocr_num, 300), np.float32)
    if cleaned:
        phoc[: len(cleaned)] = build_phoc_batch(cleaned)
        ft_proc = fasttext or FastTextProcessor()
        ft[: len(cleaned)] = ft_proc(cleaned, mmt.max_ocr_num)[: len(cleaned)]
    joint = np.concatenate([ob[:, :4], cb[:, :4]], axis=0)
    classes = build_spatial_graph(joint, task_cfg.distance_threshold)
    return {
        "question_indices": np.asarray(question_indices, np.int32),
        "question_mask": np.asarray(question_mask, np.float32),
        "pad_obj_features": of,
        "pad_obj_mask": om,
        "pad_obj_bboxes": ob,
        "pad_ocr_features": cf,
        "pad_ocr_mask": cm,
        "pad_ocr_bboxes": cb,
        "ocr_fasttext": ft,
        "ocr_phoc": phoc,
        "spatial_classes": classes.astype(np.int8),
        "ocr_tokens": list(cleaned)
        + ["<pad>"] * (mmt.max_ocr_num - len(cleaned)),
    }


#: canonical rung normalizer/validator — shared with Evaluator (the two
#: copies previously diverged on bucket=0; serving/ladder.py holds the one
#: implementation now)
_normalize_ladder = normalize_ladder


@dataclass
class ServingStats:
    """Rolling serving metrics (thread-safe: every mutation and
    ``summary()`` take the stats' own ``lock``)."""

    requests: int = 0
    batches: int = 0
    padded_rows: int = 0
    occupancy: Dict[int, int] = field(default_factory=dict)  # bucket -> count
    #: OCR-width rung -> batches routed there (only when ocr_buckets is set)
    ocr_width_occupancy: Dict[int, int] = field(default_factory=dict)
    #: obj-width rung -> batches routed there (only when obj_buckets is set)
    obj_width_occupancy: Dict[int, int] = field(default_factory=dict)
    #: per-SAMPLE needed-width histograms (always recorded — cheap ints);
    #: ServingEngine.ladder_plan() turns these into suggested rungs
    ocr_needed: Dict[int, int] = field(default_factory=dict)
    obj_needed: Dict[int, int] = field(default_factory=dict)
    #: true coalesced group size per batch (before bucket padding);
    #: ServingEngine.bucket_plan() suggests batch buckets from this
    group_sizes: Dict[int, int] = field(default_factory=dict)
    latencies_ms: deque = field(default_factory=lambda: deque(maxlen=4096))
    #: bucket size -> rolling end-to-end latencies of requests that rode a
    #: batch of that bucket (SLO attribution: big buckets amortize decode
    #: across rows but wait longer to coalesce)
    latencies_ms_by_bucket: Dict[int, deque] = field(default_factory=dict)
    #: dispatch -> answered, per batch: the transfer+decode+fetch service
    #: time, free of queueing (under a closed-loop flood latencies_ms is
    #: dominated by queue time; this is the serving-capacity number)
    service_ms: deque = field(default_factory=lambda: deque(maxlen=4096))
    #: the same, attributed to the bucket the batch rode — the measured
    #: t(B) samples bucket_plan() fits its service line to
    service_ms_by_bucket: Dict[int, deque] = field(default_factory=dict)
    #: adoption log of the live auto-tuner (ServingEngine auto_tune_every):
    #: one dict per routing swap, surfaced by summary() and the TCP stats
    autotune: List[Dict] = field(default_factory=list)
    #: monotonic stamp of the FIRST submitted request — not engine
    #: construction, so throughput_qps never amortizes warmup compile time
    started: Optional[float] = None
    lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    def summary(self) -> Dict:
        with self.lock:
            lat = np.asarray(self.latencies_ms, np.float64)
            by_bucket = {
                b: np.asarray(d, np.float64)
                for b, d in sorted(self.latencies_ms_by_bucket.items())
            }
            svc = np.asarray(self.service_ms, np.float64)
            requests = self.requests
            out = {
                "requests": requests,
                "batches": self.batches,
                "padded_rows": self.padded_rows,
                "occupancy": dict(sorted(self.occupancy.items())),
            }
            if self.ocr_width_occupancy:
                out["ocr_width_occupancy"] = dict(
                    sorted(self.ocr_width_occupancy.items())
                )
            if self.obj_width_occupancy:
                out["obj_width_occupancy"] = dict(
                    sorted(self.obj_width_occupancy.items())
                )
            if self.autotune:
                out["autotune"] = [dict(e) for e in self.autotune]
            started = self.started
        elapsed = (
            max(time.monotonic() - started, 1e-9)
            if started is not None
            else None
        )
        out["throughput_qps"] = (
            requests / elapsed if elapsed is not None else 0.0
        )
        if lat.size:
            out.update(
                latency_ms_p50=float(np.percentile(lat, 50)),
                latency_ms_p95=float(np.percentile(lat, 95)),
                latency_ms_p99=float(np.percentile(lat, 99)),
                latency_ms_mean=float(lat.mean()),
            )
        if by_bucket:
            out["latency_ms_by_bucket"] = {
                int(b): {
                    "n": int(v.size),
                    "p50": float(np.percentile(v, 50)),
                    "p95": float(np.percentile(v, 95)),
                    "p99": float(np.percentile(v, 99)),
                }
                for b, v in by_bucket.items()
            }
        if svc.size:
            out.update(
                service_ms_per_batch_p50=float(np.percentile(svc, 50)),
                service_ms_per_batch_mean=float(svc.mean()),
            )
        return out


class _Routing(NamedTuple):
    """Immutable width-routing snapshot: the batcher reads it once per
    batch, the auto-tuner swaps the whole tuple atomically — no lock on
    the hot path."""

    obj_ladder: Tuple[int, ...]
    ocr_ladder: Tuple[int, ...]
    #: (obj_width|None, ocr_width|None) -> jitted decode fn; the
    #: (None, None) full-width cell lives in ServingEngine._greedy
    grid: Dict


class _Pending(Future):
    """A request future carrying its submit time and OCR tokens."""

    def __init__(self, sample: Dict):
        super().__init__()
        self.sample = sample
        self.t_submit = time.monotonic()
        #: set when a batch this request rode in failed and it was
        #: re-enqueued for an isolated (un-coalesced) retry — a second
        #: failure then blames this request alone
        self.solo = False


class ServingEngine:
    """Queue -> coalesce -> bucket-pad -> decode -> answer strings.

    Args:
      model/params: a built SAM4C flax module + its param tree.
      answer_vocab: fixed answer VocabDict (for BOS/EOS + word decode).
      buckets: allowed batch sizes, each pre-compiled once by ``warmup``.
      ocr_buckets: optional ladder of OCR widths — a coalesced batch whose
        requests all fit in a rung runs a narrower executable (identical
        answers; same slicing as the offline evaluator's ``--ocr_bucket``).
      obj_buckets: the same ladder on the obj-region axis (detectron box
        slots, the bigger measured lever — SCALING.md "Obj-axis ladder");
        composes with ``ocr_buckets`` as a routing GRID: each batch picks
        the narrowest (obj, ocr) cell holding all its real tokens.
        ``warmup`` pre-compiles the (batch-bucket x obj x ocr) grid.
      max_wait_ms: coalescing window after the first queued request.
      decode_backend: models.fast_decode backend ("auto" = XLA, fastest),
        or "policy" — the measured early-exit x bucket-size operator rule
        (SCALING.md "Serving latency SLOs") applied per batch shape:
        bucket-1 batches run the fixed-step "xla" executable (decode is
        cheaper than dispatch jitter there), larger buckets run
        "xla_early" (identical answers by contract; ~25-30% service-time
        win on trained checkpoints). Each shape still compiles exactly
        one executable — the one the policy picks for it.
      device_put: optional callable mapping a host batch dict to device
        arrays (e.g. a sharded placement for a TP mesh); default is one
        ``jax.device_put`` of the whole batch pytree (see ``_place``).
      pipeline_depth: un-fetched device results in flight.
      auto_tune_every: > 0 enables the LIVE width-ladder auto-tuner: every
        N served batches the engine re-plans both width ladders from its
        own needed-width histograms (``ladder_plan``), and when the
        cost-model speedup of a different ladder clears
        ``auto_tune_min_speedup``, compiles the new (bucket x obj x ocr)
        cells on a background thread and atomically swaps the routing —
        live batches keep running on the old grid until the new one is
        warm. Routing is answer-invariant (same identical-answers contract
        as static ladders), so adoption never changes results, only
        service time. Adoptions are logged to ``stats.autotune`` (and the
        TCP stats response). ``bucket_plan`` stays advisory: batch-bucket
        choice feeds back into coalescing, which the plan cannot see.
      auto_tune_min_speedup: cost-model expected speedup a planned ladder
        must clear before the tuner adopts it (default 1.05).
      max_executables: budget on len(buckets) x (1+obj rungs) x
        (1+ocr rungs) the tuner may compile to (explicit ladders are not
        subject to it).
    """

    def __init__(
        self,
        model,
        params,
        answer_vocab: VocabDict,
        buckets: Sequence[int] = (1, 8, 32),
        max_wait_ms: float = 2.0,
        decode_backend: str = "auto",
        device_put=None,
        pipeline_depth: int = 2,
        max_queue: int = 4096,
        beam_size: int = 1,
        ocr_buckets: Optional[Sequence[int]] = None,
        obj_buckets: Optional[Sequence[int]] = None,
        auto_tune_every: int = 0,
        auto_tune_min_speedup: float = 1.05,
        max_executables: int = 48,
    ):
        # ValueError, not assert: these arrive from CLI flags/config and
        # must survive ``python -O`` (same class as the ladder-normalizer
        # advisor finding)
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive ints, got {buckets}")
        if beam_size < 1:
            raise ValueError(f"beam_size must be >= 1, got {beam_size}")
        self.beam_size = beam_size
        self.model = model
        # Host (numpy) param leaves would be re-uploaded by jit on EVERY
        # batch — per-leaf transfers, the exact remote-TPU RPC pathology
        # ``_place`` exists to avoid. Checkpoint restores hand back numpy
        # trees, so place them once here (one pytree transfer); trees that
        # are already jax.Arrays (possibly sharded) pass through untouched.
        if any(
            isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(params)
        ):
            params = jax.device_put(params)
        self.params = params
        self.answer_vocab = answer_vocab
        self.special = answer_vocab.special_ids()
        self.buckets = sorted(set(int(b) for b in buckets))
        self.max_wait_s = max_wait_ms / 1000.0
        self.decode_backend = decode_backend
        self.device_put = device_put
        self.stats = ServingStats()
        #: requests popped from the queue whose futures are not yet
        #: resolved (guarded by stats.lock); close(flush=True) waits on it
        self._inflight = 0
        self._queue: "Queue[_Pending]" = Queue(maxsize=max_queue)
        self._results: "Queue" = Queue(maxsize=pipeline_depth)
        self._stop = threading.Event()
        self._schema = {
            k: (v.shape, v.dtype)
            for k, v in self._zero_sample().items()
            if k in SAMPLE_KEYS
        }
        self._greedy = self._make_greedy(self.model)
        # Width ladders (ascending): coalesced batches route to the
        # narrowest (obj, ocr) grid cell that fits every request's real
        # tokens — same construction as the evaluator's _width_grid.
        # Routing reads host-local masks: single-controller only.
        mmt = self.model.params_cfg.mmt
        obj_ladder = _normalize_ladder(obj_buckets, mmt.max_obj_num, "obj")
        ocr_ladder = _normalize_ladder(ocr_buckets, mmt.max_ocr_num, "ocr")
        if (
            obj_ladder or ocr_ladder or auto_tune_every > 0
        ) and jax.process_count() > 1:
            raise ValueError(
                "width ladders route on host-local pad masks and require a "
                "single-process (single-controller) runtime; got "
                f"jax.process_count()={jax.process_count()}"
            )
        self._routing = _Routing(
            obj_ladder, ocr_ladder, self._build_grid(obj_ladder, ocr_ladder)
        )
        if auto_tune_every < 0:
            raise ValueError(
                f"auto_tune_every must be >= 0, got {auto_tune_every}"
            )
        self._auto_tune_every = int(auto_tune_every)
        self._auto_min_speedup = float(auto_tune_min_speedup)
        self._max_executables = int(max_executables)
        self._tuner: Optional[threading.Thread] = None
        self._last_tune_batch = 0
        self._batcher = threading.Thread(
            target=self._batch_loop, name="serving-batcher", daemon=True
        )
        self._consumer = threading.Thread(
            target=self._consume_loop, name="serving-consumer", daemon=True
        )
        self._threads_started = False

    # ---- decode plumbing ------------------------------------------------

    def _build_grid(self, obj_ladder, ocr_ladder, reuse=None) -> Dict:
        """Decode fns for the (obj, ocr) width cross product, reusing any
        already-built cells from ``reuse`` (an old grid) so an auto-tune
        swap only constructs what is genuinely new."""
        grid = {}
        if not (obj_ladder or ocr_ladder):
            return grid
        from ..models.sa_m4c import with_widths

        reuse = reuse or {}
        for ow in (*obj_ladder, None):
            for cw in (*ocr_ladder, None):
                if (ow, cw) == (None, None):
                    continue
                grid[(ow, cw)] = reuse.get((ow, cw)) or self._make_greedy(
                    with_widths(self.model, n_obj=ow, n_ocr=cw)
                )
        return grid

    def _make_greedy(self, model):
        from ..models.fast_decode import (
            beam_search_decode_fast,
            greedy_decode_fast,
        )

        bos = self.special.bos
        eos = self.special.eos
        backend = self.decode_backend

        if self.beam_size > 1:
            k = self.beam_size

            @jax.jit
            def fn(params, device_batch):
                # best beam by total score reduced to plain token rows ON
                # DEVICE, so the consumer path is decode-mode agnostic;
                # early_exit is bit-identical for beams (fast_decode)
                seqs, scores = beam_search_decode_fast(
                    model, params, device_batch, k, bos, eos,
                    early_exit=True,
                )
                best = jnp.argmax(scores, axis=1)
                pred = jnp.take_along_axis(
                    seqs, best[:, None, None], axis=1
                )[:, 0, 1:]  # drop BOS, like the beam evaluator
                return scores, pred

            return fn

        if backend == "policy":
            # one executable per shape either way: jit specializes on the
            # leading (bucket) dim, and the host-side pick below is a pure
            # function of that dim, so warmup compiles exactly the grid a
            # static backend would
            fixed = jax.jit(
                lambda params, b: greedy_decode_fast(
                    model, params, b, bos, backend="xla", eos_idx=eos
                )
            )
            early = jax.jit(
                lambda params, b: greedy_decode_fast(
                    model, params, b, bos, backend="xla_early", eos_idx=eos
                )
            )

            def fn(params, device_batch):
                rows = device_batch["question_indices"].shape[0]
                return (fixed if rows == 1 else early)(params, device_batch)

            return fn

        @jax.jit
        def fn(params, device_batch):
            return greedy_decode_fast(
                model, params, device_batch, bos, backend=backend,
                eos_idx=eos,
            )

        return fn

    def _zero_sample(self) -> Dict:
        mmt = self.model.params_cfg.mmt
        q, o, c = mmt.max_seq_length, mmt.max_obj_num, mmt.max_ocr_num
        return {
            "question_indices": np.zeros(q, np.int32),
            "question_mask": np.zeros(q, np.float32),
            "pad_obj_features": np.zeros((o, 2048), np.float32),
            "pad_obj_mask": np.zeros(o, np.float32),
            "pad_obj_bboxes": np.zeros((o, 5), np.float32),
            "pad_ocr_features": np.zeros((c, 2048), np.float32),
            "pad_ocr_mask": np.zeros(c, np.float32),
            "pad_ocr_bboxes": np.zeros((c, 5), np.float32),
            "ocr_fasttext": np.zeros((c, 300), np.float32),
            "ocr_phoc": np.zeros((c, 604), np.float32),
            "spatial_classes": np.zeros((o + c, o + c), np.int8),
            "ocr_tokens": ["<pad>"] * c,
        }

    def _stack(self, samples: List[Dict], bucket: int) -> Dict:
        """Stack per-request samples to a (bucket, ...) device batch; pad
        rows replicate row 0 (their decodes are discarded)."""
        idx = list(range(len(samples))) + [0] * (bucket - len(samples))
        batch = {
            k: np.stack([np.asarray(samples[i][k]) for i in idx])
            for k in SAMPLE_KEYS
        }
        t = self.model.params_cfg.mmt.num_decoding_steps
        batch["train_prev_inds"] = np.zeros((bucket, t), np.int32)
        return cast_features_for_transfer(batch, self.model.dtype)

    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    @property
    def ladder_widths(self) -> List[int]:
        """Ascending OCR-width ladder rungs (empty without --ocr_bucket)."""
        return list(self._routing.ocr_ladder)

    @property
    def obj_ladder_widths(self) -> List[int]:
        """Ascending obj-width ladder rungs (empty without --obj_bucket)."""
        return list(self._routing.obj_ladder)

    @property
    def num_executables(self) -> int:
        """Size of the compiled (batch-bucket x obj-width x OCR-width) grid
        warmup touches: every bucket at every grid cell plus full width."""
        r = self._routing
        return (
            len(self.buckets)
            * (1 + len(r.obj_ladder))
            * (1 + len(r.ocr_ladder))
        )

    def _route_widths(self, samples: List[Dict]):
        """Narrowest (obj, ocr) grid cell holding every real token across
        the group (None on an axis -> full width there; (None, None) -> the
        full executable). Widths are known at request time, so serving gets
        sequence-length bucketing for free. Also records the per-sample
        needed-width histograms ladder_plan() suggests rungs from."""
        from ..evaluation.evaluator import needed_width

        obj_needs = [needed_width(s["pad_obj_mask"]) for s in samples]
        ocr_needs = [needed_width(s["pad_ocr_mask"]) for s in samples]
        with self.stats.lock:
            for n in obj_needs:
                self.stats.obj_needed[n] = self.stats.obj_needed.get(n, 0) + 1
            for n in ocr_needs:
                self.stats.ocr_needed[n] = self.stats.ocr_needed.get(n, 0) + 1

        def pick(ladder, needs):
            need = max(needs)
            for w in ladder:
                if need <= w:
                    return w
            return None

        r = self._routing  # one atomic snapshot per batch (auto-tune swaps)
        ow = pick(r.obj_ladder, obj_needs) if r.obj_ladder else None
        cw = pick(r.ocr_ladder, ocr_needs) if r.ocr_ladder else None
        if (ow, cw) == (None, None):
            return self._greedy, None, None
        return r.grid[(ow, cw)], ow, cw

    def ladder_plan(self, max_rungs: int = 2) -> Dict:
        """Suggested ``ocr_buckets``/``obj_buckets`` ladders from the
        needed-width histograms of live traffic (per sample — the serving
        granularity). Planning estimates under the cost model in
        serving/ladder.py; re-measure before deploying. Exposed by the TCP
        ``{"stats": true}`` response as ``ladder_plan``."""
        from .ladder import plan_axis

        with self.stats.lock:
            snap = {
                "ocr": dict(self.stats.ocr_needed),
                "obj": dict(self.stats.obj_needed),
            }
        mmt = self.model.params_cfg.mmt
        out = {}
        for axis, counts in snap.items():
            plan = plan_axis(counts, axis, mmt, max_rungs)
            if plan:
                out[axis] = plan
        return out

    def bucket_plan(self, max_buckets: int = 3) -> Optional[Dict]:
        """Suggested ``buckets`` (batch sizes) from live traffic: the
        coalesced-group-size histogram costed under a ``t(B) = a + b*B``
        service line fit to this engine's own per-bucket service-time
        measurements (serving/ladder.py plan_buckets — first-order
        estimate: bucket choice feeds back into coalescing). Exposed as
        ``bucket_plan`` in the TCP stats response; None until a batch has
        been served, a ``reason`` until two distinct buckets have been."""
        from .ladder import plan_buckets

        with self.stats.lock:
            groups = dict(self.stats.group_sizes)
            svc = {
                b: list(d)
                for b, d in self.stats.service_ms_by_bucket.items()
            }
        return plan_buckets(groups, svc, max_buckets)

    # ---- live auto-tuning -------------------------------------------------

    #: lifetime cap on routing swaps (see the flap guard in _maybe_autotune)
    _MAX_ADOPTIONS = 8

    def _maybe_autotune(self, batches: int):
        """Batcher-thread hook: kick a background re-plan every
        ``auto_tune_every`` served batches (never more than one tuner at a
        time; the check runs outside any lock — ``batches`` is a snapshot)."""
        with self.stats.lock:
            adoptions = len(self.stats.autotune)
        if (
            batches - self._last_tune_batch < self._auto_tune_every
            or adoptions >= self._MAX_ADOPTIONS  # flap guard: each swap may
            # recompile cells, so a planner oscillating between near-equal
            # ladders must not burn compile time forever
            or self._stop.is_set()
            or (self._tuner is not None and self._tuner.is_alive())
        ):
            return
        self._last_tune_batch = batches
        self._tuner = threading.Thread(
            target=self._autotune_once, args=(batches,),
            name="serving-tuner", daemon=True,
        )
        self._tuner.start()

    def _pick_plan_ladders(self):
        """(obj_ladder, ocr_ladder, {axis: expected_speedup}) chosen from
        ``ladder_plan`` under the executable budget; an axis keeps its
        current rungs when no planned ladder clears ``auto_tune_min_speedup``.
        obj is considered first — the bigger measured lever (SCALING.md
        "Obj-axis ladder")."""
        plan = self.ladder_plan(max_rungs=2)
        r = self._routing
        chosen = {"obj": r.obj_ladder, "ocr": r.ocr_ladder}
        expected = {}
        n_buckets = len(self.buckets)
        for axis, other in (("obj", "ocr"), ("ocr", "obj")):
            best = None
            for e in (plan.get(axis) or {}).get("ladders", []):
                if e["expected_speedup"] < self._auto_min_speedup:
                    continue
                execs = (
                    n_buckets
                    * (1 + len(e["rungs"]))
                    * (1 + len(chosen[other]))
                )
                if execs > self._max_executables:
                    continue
                if best is None or (
                    e["expected_speedup"] > best["expected_speedup"]
                ):
                    best = e
            if best is not None:
                chosen[axis] = tuple(best["rungs"])
                expected[axis] = best["expected_speedup"]
        return chosen["obj"], chosen["ocr"], expected

    def _autotune_once(self, at_batch: int):
        """Tuner-thread body: re-plan, compile any new grid cells (warming
        each at every bucket BEFORE it can be routed to — live traffic keeps
        running on the old grid meanwhile), then swap the routing snapshot
        atomically and log the adoption. Routing is answer-invariant, so a
        swap can only change service time, never results. Never raises —
        a tuner failure must not take serving down."""
        try:
            obj_l, ocr_l, expected = self._pick_plan_ladders()
            r = self._routing
            if (obj_l, ocr_l) == (r.obj_ladder, r.ocr_ladder):
                return
            t0 = time.monotonic()
            grid = self._build_grid(obj_l, ocr_l, reuse=r.grid)
            new_cells = [c for c in grid if c not in r.grid]
            zero = self._zero_sample()
            for b in self.buckets:
                host = self._stack([zero], b)
                for ow, cw in new_cells:
                    if self._stop.is_set():
                        return
                    _, pred = grid[(ow, cw)](
                        self.params, self._place(self._shrink(host, ow, cw))
                    )
                    np.asarray(pred)
            if self._stop.is_set():
                return
            self._routing = _Routing(obj_l, ocr_l, grid)
            event = {
                "at_batch": at_batch,
                "obj_ladder": list(obj_l),
                "ocr_ladder": list(ocr_l),
                "expected_speedup": {
                    k: round(float(v), 3) for k, v in expected.items()
                },
                "new_cells": len(new_cells),
                "warmup_s": round(time.monotonic() - t0, 2),
            }
            with self.stats.lock:
                self.stats.autotune.append(event)
            logger.info("auto-tune adopted %s", event)
        except Exception:
            # Exception, NOT BaseException: the tuner thread must swallow
            # planner/compile failures but let interpreter-shutdown signals
            # (KeyboardInterrupt/SystemExit) propagate instead of logging
            # them as a spurious "auto-tune failed".
            logger.exception("serving auto-tune failed; routing unchanged")

    def _shrink(self, host_batch: Dict, obj_w, ocr_w) -> Dict:
        """Slice a stacked host batch down to a (obj, ocr) grid cell (None
        = full width on that axis). OCR first, then obj — shrink_obj_batch
        handles an already-OCR-shrunk spatial matrix (the evaluator's
        _route_widths order)."""
        if (obj_w, ocr_w) == (None, None):
            return host_batch
        from ..evaluation.evaluator import shrink_obj_batch, shrink_ocr_batch

        n_obj = self.model.params_cfg.mmt.max_obj_num
        if ocr_w is not None:
            host_batch = shrink_ocr_batch(host_batch, n_obj, ocr_w)
        if obj_w is not None:
            host_batch = shrink_obj_batch(host_batch, n_obj, obj_w)
        return host_batch

    def _place(self, host_batch: Dict):
        """One device_put of the WHOLE batch pytree. A single transfer RPC
        matters on remote-attached TPUs: shipping the 13 arrays as separate
        transfers (what jit does with numpy leaves) costs one round trip
        EACH (~40 ms over a tunnel, measured ~460 ms/batch); one pytree put
        moves the same 23 MB in ~9 ms."""
        put = self.device_put or jax.device_put
        return put(host_batch)

    def warmup(self):
        """Compile every bucket size up front so no live request pays the
        (tens of seconds on TPU) first-shape compile. Fetches (not just
        blocks on) each result: the first device->host fetch of a decode
        output is where remote-TPU runtimes settle one-time setup costs,
        and it must not land on a live request."""
        zero = self._zero_sample()
        cells = list(self._routing.grid.items()) + [
            ((None, None), self._greedy)
        ]
        for b in self.buckets:
            host = self._stack([zero], b)
            # the full (batch-bucket x obj-width x OCR-width) executable grid
            for (ow, cw), fn in cells:
                _, pred = fn(
                    self.params, self._place(self._shrink(host, ow, cw))
                )
                np.asarray(pred)

    # ---- public API -----------------------------------------------------

    def start(self):
        if not self._threads_started:
            self._threads_started = True
            self._batcher.start()
            self._consumer.start()
        return self

    def _validate(self, sample: Dict) -> Dict:
        """Shape-check a request against the model schema on the CALLER's
        thread, so one malformed request raises at ``submit`` instead of
        failing every innocent request coalesced into its batch. Arrays are
        normalized to the schema DTYPE as well: a float64 question built
        from JSON numbers would otherwise reach the device layer as a novel
        jit signature — a fresh multi-second compile at best, a poisoned
        batch at worst. Non-numeric payloads fail the astype here."""
        out = {}
        for k, (want_shape, want_dtype) in self._schema.items():
            if k not in sample:
                raise KeyError(f"request missing {k!r}")
            arr = np.asarray(sample[k])
            if arr.shape != want_shape:
                raise ValueError(
                    f"request {k!r} has shape {arr.shape}, "
                    f"expected {want_shape}"
                )
            out[k] = arr.astype(want_dtype, copy=False)
        if "ocr_tokens" not in sample:
            # silently defaulting would decode OCR-pointer predictions to
            # the literal '<pad>' — confidently wrong answers, not errors
            raise KeyError("request missing 'ocr_tokens'")
        # normalize OCR tokens to exactly max_ocr_num entries: a short list
        # would IndexError the answer decode for any OCR-pointer prediction
        tokens = [str(t) for t in sample["ocr_tokens"]]
        n_ocr = self._schema["pad_ocr_mask"][0][0]
        out["ocr_tokens"] = (tokens + ["<pad>"] * n_ocr)[:n_ocr]
        return out

    def submit(self, sample: Dict) -> Future:
        """Enqueue one request; resolves to ``{"answer", "belongs_to",
        "latency_ms"}``. ``sample`` follows the SAMPLE_KEYS schema plus an
        ``ocr_tokens`` string list (see :func:`build_sample`). Malformed
        requests (wrong shapes / missing keys) raise here, synchronously."""
        if self._stop.is_set():
            raise RuntimeError("engine is closed")
        sample = self._validate(sample)
        if not self._threads_started:
            self.start()
        with self.stats.lock:
            if self.stats.started is None:
                self.stats.started = time.monotonic()
        # Down-cast features to the compute dtype NOW, on the caller's
        # thread: halves the bytes the (single) batcher thread must stack
        # and parallelizes the cast across submitters. Bit-identical to
        # casting after the stack (same per-element rounding).
        fut = _Pending(cast_features_for_transfer(sample, self.model.dtype))
        self._queue.put(fut)
        return fut

    def submit_many(self, samples: Sequence[Dict]) -> List[Future]:
        return [self.submit(s) for s in samples]

    def close(self, flush: bool = True, timeout: float = 60.0):
        """Stop the worker threads; ``flush`` first drains queued AND
        in-flight work (a batch the batcher has popped but the consumer has
        not yet answered counts — ``_inflight`` tracks it)."""
        if flush and self._threads_started:
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                with self.stats.lock:
                    inflight = self._inflight
                if (
                    self._queue.empty()
                    and self._results.empty()
                    and inflight == 0
                ):
                    break
                time.sleep(0.005)
        self._stop.set()
        if self._threads_started:
            self._batcher.join(timeout=timeout)
            self._consumer.join(timeout=timeout)
        if self._tuner is not None:
            self._tuner.join(timeout=timeout)
        # fail anything still queued so callers never hang
        try:
            while True:
                fut = self._queue.get_nowait()
                fut.set_exception(RuntimeError("engine closed"))
        except Empty:
            pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ---- worker threads -------------------------------------------------

    def _resolve_group(self, group: List[_Pending], exc: BaseException):
        """Fail a group's futures — or, for multi-request groups, re-enqueue
        each request for an ISOLATED retry, so one poisonous request cannot
        fail innocents coalesced into its batch (a solo retry that fails
        again is blamed alone). In-flight accounting stays with the caller."""
        for g in group:
            if g.done():
                continue
            if len(group) > 1 and not g.solo and not self._stop.is_set():
                g.solo = True
                try:
                    self._queue.put_nowait(g)
                    continue
                except Full:
                    pass
            g.set_exception(exc)

    def _batch_loop(self):
        max_bucket = self.buckets[-1]
        carry = None  # a solo retry popped mid-coalesce, batched next
        while True:
            if carry is not None:
                # already popped from the queue: batch it even if stop was
                # requested meanwhile, or its future would be stranded
                first, carry = carry, None
            elif self._stop.is_set():
                break
            else:
                try:
                    first = self._queue.get(timeout=0.05)
                except Empty:
                    continue
            group = [first]
            deadline = time.monotonic() + self.max_wait_s
            # a ``solo`` request is an isolated retry — it NEVER shares a
            # batch, in either direction: a solo first coalesces nothing,
            # and a solo popped while coalescing is carried to its own
            # next batch (riding along would let a fresh poisonous request
            # fail it permanently — _resolve_group blames solos on the spot)
            while not first.solo and len(group) < max_bucket:
                remaining = deadline - time.monotonic()
                if remaining <= 0 and self._queue.empty():
                    break
                try:
                    nxt = self._queue.get(timeout=max(remaining, 0))
                except Empty:
                    break
                if nxt.solo:
                    carry = nxt
                    break
                group.append(nxt)
            with self.stats.lock:
                self._inflight += len(group)
            try:
                bucket = self._pick_bucket(len(group))
                samples = [g.sample for g in group]
                fn, obj_w, ocr_w = self._route_widths(samples)
                host_batch = self._shrink(
                    self._stack(samples, bucket), obj_w, ocr_w
                )
                batch = self._place(host_batch)
                # async dispatch: hand the un-fetched result to the consumer
                _, pred_ids = fn(self.params, batch)
                with self.stats.lock:
                    self.stats.batches += 1
                    self.stats.padded_rows += bucket - len(group)
                    self.stats.occupancy[bucket] = (
                        self.stats.occupancy.get(bucket, 0) + 1
                    )
                    self.stats.group_sizes[len(group)] = (
                        self.stats.group_sizes.get(len(group), 0) + 1
                    )
                    if ocr_w is not None:
                        self.stats.ocr_width_occupancy[ocr_w] = (
                            self.stats.ocr_width_occupancy.get(ocr_w, 0) + 1
                        )
                    if obj_w is not None:
                        self.stats.obj_width_occupancy[obj_w] = (
                            self.stats.obj_width_occupancy.get(obj_w, 0) + 1
                        )
                    n_batches = self.stats.batches
                self._results.put((group, pred_ids, time.monotonic()))
                if self._auto_tune_every:
                    self._maybe_autotune(n_batches)
            except BaseException as e:  # bad batch: isolate/fail, keep serving
                self._resolve_group(group, e)
                # resolved or re-enqueued here — no longer in flight (a
                # re-enqueued solo retry re-increments when popped again)
                with self.stats.lock:
                    self._inflight -= len(group)

    def _consume_loop(self):
        # run until: stop requested AND the batcher can no longer produce
        # (it exits only between batches) AND nothing is left to consume —
        # checking _results alone would strand a batch the batcher holds
        # in flight at stop time
        while not (
            self._stop.is_set()
            and not self._batcher.is_alive()
            and self._results.empty()
        ):
            try:
                group, pred_ids, t_disp = self._results.get(timeout=0.05)
            except Empty:
                continue
            try:
                ids = np.asarray(pred_ids)  # blocks until the device is done
                decoded = decode_predictions(
                    ids[: len(group)],
                    [g.sample["ocr_tokens"] for g in group],
                    self.answer_vocab.word_list,
                    self.special.eos,
                )
                now = time.monotonic()
                bucket = int(ids.shape[0])  # rows incl. coalesce padding
                with self.stats.lock:
                    self.stats.requests += len(group)
                    svc = (now - t_disp) * 1000.0
                    self.stats.service_ms.append(svc)
                    self.stats.service_ms_by_bucket.setdefault(
                        bucket, deque(maxlen=1024)
                    ).append(svc)
                    per_bucket = self.stats.latencies_ms_by_bucket.setdefault(
                        bucket, deque(maxlen=4096)
                    )
                    for g in group:
                        ms = (now - g.t_submit) * 1000.0
                        self.stats.latencies_ms.append(ms)
                        per_bucket.append(ms)
                for g, d in zip(group, decoded):
                    g.set_result(
                        {
                            "answer": d["pred_answer"],
                            "belongs_to": d["belongs_to"],
                            "latency_ms": (now - g.t_submit) * 1000.0,
                        }
                    )
            except BaseException as e:  # never strand a future
                self._resolve_group(group, e)
            finally:
                # every popped group leaves flight exactly once (solo
                # retries re-increment when the batcher pops them again)
                with self.stats.lock:
                    self._inflight -= len(group)
