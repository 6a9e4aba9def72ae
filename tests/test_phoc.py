"""PHOC featurizer tests: native/python backend parity and parity with the
reference C extension's algorithm (via golden structural properties)."""

import os

import numpy as np
import pytest

from sam_textvqa_tpu.ops.phoc import (
    PHOC_DIM,
    _build_phoc_python,
    _clean,
    _native_lib,
    build_phoc,
    build_phoc_batch,
)

WORDS = [
    "hello", "the", "a", "", "42", "stop", "Sign!", "café", "x" * 40,
    "antidisestablishmentarianism", "th", "0", "restaurant", "COCA-COLA",
]


def test_shape_and_dtype():
    v = build_phoc("hello")
    assert v.shape == (PHOC_DIM,)
    assert v.dtype == np.float32
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_clean_filters_alphabet():
    assert _clean("Café-42!") == "caf42"
    assert _clean("  STOP ") == "stop"


@pytest.mark.skipif(_native_lib() is None, reason="native phoc lib unavailable")
def test_native_matches_python():
    for w in WORDS:
        native = build_phoc(w, backend="native")
        py = _build_phoc_python(_clean(w))
        np.testing.assert_array_equal(native, py, err_msg=w)


@pytest.mark.skipif(_native_lib() is None, reason="native phoc lib unavailable")
def test_batch_matches_single():
    batch = build_phoc_batch(WORDS)
    for i, w in enumerate(WORDS):
        np.testing.assert_array_equal(batch[i], build_phoc(w))


def test_unigram_level2_regions():
    # "ab": 'a' occupies [0, 0.5) -> level-2 region 0; 'b' region 1.
    v = _build_phoc_python("ab")
    a_idx, b_idx = 0, 1
    assert v[0 * 36 + a_idx] == 1.0  # level 2 region 0
    assert v[1 * 36 + b_idx] == 1.0  # level 2 region 1
    assert v[0 * 36 + b_idx] == 0.0
    assert v[1 * 36 + a_idx] == 0.0


def test_bigram_section():
    # "th" is bigram 0; whole word occupies both level-2 regions.
    v = _build_phoc_python("th")
    off = 36 * 14
    assert v[off + 0] == 1.0 and v[off + 50] == 1.0
    # word without known bigrams leaves the section empty
    v2 = _build_phoc_python("xq")
    assert v2[off:].sum() == 0.0


def test_reference_parity_golden():
    # A 1-char word spans [0,1]; only level-2 regions (width 1/2) reach the
    # >=0.5 occupancy threshold, so exactly the two level-2 slots light up.
    v = _build_phoc_python("a")
    assert v.sum() == 2
    assert v[0 * 36] == 1.0 and v[1 * 36] == 1.0


@pytest.fixture(scope="module")
def reference_cphoc(tmp_path_factory):
    """Compile the reference C extension in a temp dir as a parity oracle."""
    import subprocess
    import sys
    import sysconfig

    src = "/root/reference/sam/phoc/cphoc.c"
    if not os.path.exists(src):
        pytest.skip("reference not mounted")
    build = tmp_path_factory.mktemp("cphoc_build")
    so = build / "cphoc.so"
    inc = sysconfig.get_paths()["include"]
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}", "-o", str(so), src],
            check=True, capture_output=True, timeout=120,
        )
    except Exception as e:
        pytest.skip(f"could not build reference extension: {e}")
    sys.path.insert(0, str(build))
    import cphoc

    return cphoc


def test_matches_reference_c_extension(reference_cphoc):
    for w in WORDS:
        cleaned = _clean(w)
        ref = np.array(reference_cphoc.build_phoc(cleaned), dtype=np.float32)
        np.testing.assert_array_equal(build_phoc(w), ref, err_msg=w)
    rng = np.random.RandomState(0)
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    for _ in range(200):
        w = "".join(rng.choice(list(chars), size=rng.randint(1, 25)))
        ref = np.array(reference_cphoc.build_phoc(w), dtype=np.float32)
        np.testing.assert_array_equal(build_phoc(w), ref, err_msg=w)
