"""Native batch assembler (csrc/batcher.cc via ops/batcher.py): bit parity
of the bf16 RNE cast vs ml_dtypes, gather correctness, fallback equality,
and the prefetch cast wiring."""

import numpy as np
import pytest

from sam_textvqa_tpu.ops import batcher

ml_dtypes = pytest.importorskip("ml_dtypes")
BF16 = np.dtype(ml_dtypes.bfloat16)


def _all_high_halves(low_bits):
    bits = (np.arange(2**16, dtype=np.uint32) << 16) | np.uint32(low_bits)
    return bits.view(np.float32)


@pytest.mark.skipif(not batcher.native_available(), reason="no native lib")
@pytest.mark.parametrize(
    "low", [0x0000, 0x8000, 0x8001, 0xFFFF, 0x7FFF, 0x1234]
)
def test_cast_bit_parity_exhaustive_high_halves(low):
    """Every possible bf16-adjacent pattern: all 2^16 high halves with a
    fixed low half covering round-down, tie-to-even, round-up, NaN
    payloads, and +-inf."""
    f = _all_high_halves(low)
    with np.errstate(invalid="ignore"):
        ref = f.astype(BF16)
    got = batcher.cast_bf16(f.copy())
    assert (got.view(np.uint16) == ref.view(np.uint16)).all()


@pytest.mark.skipif(not batcher.native_available(), reason="no native lib")
def test_cast_specials():
    f = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, -np.nan, 1e-45, -1e-45,
         3.389531389e38, 65504.0, 1.0, -2.5],
        np.float32,
    )
    with np.errstate(invalid="ignore"):
        ref = f.astype(BF16)
    got = batcher.cast_bf16(f)
    assert (got.view(np.uint16) == ref.view(np.uint16)).all()


def test_gather_rows_f32_and_fused():
    rng = np.random.RandomState(0)
    rows = [rng.randn(17, 33).astype(np.float32) for _ in range(9)]
    g = batcher.gather_rows(rows)
    np.testing.assert_array_equal(g, np.stack(rows))
    gb = batcher.gather_rows(rows, cast_bf16=True)
    ref = np.stack(rows).astype(BF16)
    assert (gb.view(np.uint16) == ref.view(np.uint16)).all()


def test_gather_rows_1d_and_out_buffer():
    rng = np.random.RandomState(1)
    rows = [rng.randn(50).astype(np.float32) for _ in range(4)]
    out = np.empty((4, 50), np.float32)
    g = batcher.gather_rows(rows, out=out)
    assert g is out
    np.testing.assert_array_equal(out, np.stack(rows))


def test_gather_rows_fallback_matches_native(monkeypatch):
    rng = np.random.RandomState(2)
    rows = [rng.randn(6, 7).astype(np.float32) for _ in range(5)]
    native = batcher.gather_rows(rows, cast_bf16=True)
    monkeypatch.setattr(batcher, "_native_lib", lambda: None)
    fallback = batcher.gather_rows(rows, cast_bf16=True)
    assert (native.view(np.uint16) == fallback.view(np.uint16)).all()


def test_gather_rows_noncontiguous_rows_fall_back():
    rng = np.random.RandomState(3)
    base = rng.randn(4, 10, 6).astype(np.float32)
    rows = [base[i, :, ::2] for i in range(4)]  # non-contiguous views
    g = batcher.gather_rows(rows)
    np.testing.assert_array_equal(g, np.stack(rows))


def test_prefetch_cast_uses_native_and_matches(monkeypatch):
    """cast_features_for_transfer output is identical with the threaded
    native cast forced on and with plain ml_dtypes astype."""
    from sam_textvqa_tpu.data.prefetch import cast_features_for_transfer

    rng = np.random.RandomState(4)
    batch = {
        "pad_obj_features": rng.randn(3, 10, 2048).astype(np.float32),
        "ocr_phoc": rng.randn(3, 5, 604).astype(np.float32),
        "question_mask": np.ones((3, 8), np.float32),  # never cast
        "spatial_classes": np.zeros((3, 15, 15), np.int8),
    }
    monkeypatch.setenv("SAM_BATCHER_THREADS", "2")
    forced = cast_features_for_transfer(dict(batch), BF16)
    monkeypatch.setenv("SAM_BATCHER_THREADS", "1")
    plain = cast_features_for_transfer(dict(batch), BF16)
    for k in ("pad_obj_features", "ocr_phoc"):
        assert forced[k].dtype == BF16
        assert (
            forced[k].view(np.uint16) == plain[k].view(np.uint16)
        ).all(), k
    assert forced["question_mask"].dtype == np.float32
    assert forced["spatial_classes"].dtype == np.int8


def test_threads_env_override(monkeypatch):
    monkeypatch.setenv("SAM_BATCHER_THREADS", "3")
    assert batcher._num_threads() == 3
    monkeypatch.delenv("SAM_BATCHER_THREADS")
    assert batcher._num_threads() >= 1
