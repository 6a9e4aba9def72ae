"""Unit tests for tools/suggest_ladder.py's rung-selection math (the pure
functions; the CLI is exercised manually — it just wires these to
train.build_datasets)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "suggest_ladder", os.path.join(REPO, "tools/suggest_ladder.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("suggest_ladder", mod)
    spec.loader.exec_module(mod)
    return mod


def test_expected_time_routes_to_smallest_fitting_rung():
    m = _load()
    cost = {10: 0.5, 30: 0.8, None: 1.0}.__getitem__
    counts = {5: 2, 25: 1, 45: 1}  # ->10, ->30, ->full
    t = m.expected_time(counts, (10, 30), cost)
    assert abs(t - (2 * 0.5 + 1 * 0.8 + 1 * 1.0) / 4) < 1e-12


def test_best_ladder_picks_cost_minimizing_rungs():
    m = _load()

    # linear cost in width; full width 50
    def cost(w):
        width = 50 if w is None else w
        return width / 50.0

    # two tight clusters -> the 2-rung optimum sits on the cluster maxima;
    # the 1-rung optimum is the LOW cluster's max (the high cluster falls
    # through to full width: 0.5*(10/50) + 0.5*1.0 = 0.6 beats 40/50 = 0.8)
    counts = {8: 10, 10: 10, 38: 10, 40: 10}
    ladders = m.best_ladder(counts, 2, cost, full=50)
    assert ladders[0]["rungs"] == [10]
    assert ladders[1]["rungs"] == [10, 40]
    # speedups are monotone in rung count and marginals multiply up
    assert ladders[1]["expected_speedup"] >= ladders[0]["expected_speedup"]
    got = ladders[0]["expected_speedup"] * ladders[1]["marginal_vs_fewer_rungs"]
    assert abs(got - ladders[1]["expected_speedup"]) < 1e-9


def test_best_ladder_ignores_full_width_and_caps_rung_count():
    m = _load()

    def cost(w):
        return 1.0 if w is None else w / 50.0

    # only one usable candidate (full-width observations are not rungs)
    counts = {50: 5, 20: 5}
    ladders = m.best_ladder(counts, 3, cost, full=50)
    assert len(ladders) == 1
    assert ladders[0]["rungs"] == [20]


def test_fit_service_line_recovers_affine_profile():
    from sam_textvqa_tpu.serving.ladder import fit_service_line

    # exact t(B) = 2 + 0.3*B at three buckets (median kills the outlier)
    svc = {1: [2.3, 2.3, 99.0], 8: [4.4, 4.4, 4.4], 32: [11.6]}
    a, b = fit_service_line(svc)
    assert abs(a - 2.0) < 1e-9 and abs(b - 0.3) < 1e-9
    # one bucket measured, or a non-increasing line: no fit
    assert fit_service_line({8: [4.4, 4.5]}) is None
    assert fit_service_line({1: [5.0], 8: [3.0]}) is None


def test_plan_buckets_picks_group_size_rungs():
    from sam_textvqa_tpu.serving.ladder import plan_buckets

    svc = {1: [2.3], 32: [11.6]}  # t(B) = 2 + 0.3*B
    # half the batches are singles, half ride at the 32 top bucket:
    # one extra bucket at 1 saves 0.5*(t(32)-t(1))/t(32)
    groups = {1: 50, 32: 50}
    plan = plan_buckets(groups, svc, max_buckets=2)
    assert plan["top_bucket"] == 32
    assert plan["service_fit_ms"] == {"dispatch": 2.0, "per_row": 0.3}
    (lad,) = plan["ladders"]
    assert lad["buckets"] == [1, 32]
    want = 1.0 / (0.5 * (2.3 / 11.6) + 0.5)
    assert abs(lad["expected_speedup"] - want) < 1e-9


def test_plan_buckets_degrades_gracefully():
    from sam_textvqa_tpu.serving.ladder import plan_buckets

    assert plan_buckets({}, {}, 3) is None  # nothing observed yet
    plan = plan_buckets({4: 3}, {4: [5.0]}, 3)  # one bucket measured
    assert plan["top_bucket"] == 4
    assert "ladders" not in plan and "reason" in plan


def test_normalize_ladder_is_canonical_and_raises_on_bad_rungs():
    """ADVICE round 4: the engine and evaluator normalizers diverged on
    bucket=0 and validated CLI input with bare assert (stripped under
    python -O). One shared implementation now: only None / an empty
    sequence disables the ladder; 0 and >= full-width rungs raise
    ValueError from both entry points."""
    import numpy as np
    import pytest
    from sam_textvqa_tpu.serving.ladder import normalize_ladder
    from sam_textvqa_tpu.serving.engine import _normalize_ladder as eng
    from sam_textvqa_tpu.evaluation.evaluator import Evaluator

    for fn in (
        normalize_ladder,
        eng,
        lambda b, w, a: Evaluator._normalize_ladder(b, w, a),
    ):
        assert fn(None, 50, "ocr") == ()
        assert fn((), 50, "ocr") == ()
        assert fn([], 50, "ocr") == ()
        assert fn(np.int64(25), 50, "ocr") == (25,)
        assert fn([30, 10, 30], 50, "ocr") == (10, 30)
        with pytest.raises(ValueError):
            fn(0, 50, "ocr")  # explicit 0 is an invalid width, not "off"
        with pytest.raises(ValueError):
            fn([10, 50], 50, "ocr")  # full width needs no rung
        with pytest.raises(ValueError):
            fn(-3, 50, "ocr")


def test_best_ladder_thins_wide_candidate_pools():
    """ADVICE round 4: per-sample serving histograms carry 100+ distinct
    widths and combinations(100+, 3) took minutes. Pools above
    MAX_CANDIDATES are thinned to count-weighted quantile representatives
    (still observed widths), and the search still lands on/near the mass."""
    from sam_textvqa_tpu.serving import ladder as L

    def cost(w):
        return 1.0 if w is None else (32 + w) / 82.0

    # 120 distinct widths; 90% of the mass sits at width <= 12
    counts = {w: (200 if w <= 12 else 2) for w in range(1, 121)}
    thinned = L._thin_candidates(counts, sorted(counts))
    assert len(thinned) <= L.MAX_CANDIDATES + 1
    assert set(thinned) <= set(counts)
    assert thinned == sorted(thinned)
    assert max(thinned) == 120  # extremes survive thinning

    ladders = L.best_ladder(counts, 3, cost, full=150)
    assert len(ladders) == 3
    # the heavy low cluster must own a rung near its top
    assert any(10 <= r <= 16 for r in ladders[-1]["rungs"])
