"""Pure-Python fastText .bin ingest (data/fasttext_bin.py).

The reference loads wiki.en.bin through the native fastText library
(reference sam/datasets/processors.py:191-200) and means vectors over
space-split subwords (processors.py:96-102). These tests pin our reader to
the library's documented on-disk format and subword semantics
(fasttext.cc getWordVector, dictionary.cc computeSubwords/hash/pushHash),
round-trip actual .bin bytes through the fixture writer, and prove the
FastTextProcessor fallback engages when the native lib is absent (it is
absent in this container).
"""

import numpy as np
import pytest

from sam_textvqa_tpu.data.fasttext_bin import (
    EOS,
    FastTextBin,
    ft_hash,
    subword_ngrams,
    write_fasttext_bin,
)
from sam_textvqa_tpu.data.processors import FastTextProcessor


def test_ft_hash_fnv1a_constants():
    """FNV-1a with fastText's int8 sign-extension (dictionary.cc hash()):
    offset basis 2166136261, prime 16777619, byte = uint32_t(int8_t(c)).
    Values are frozen transcriptions of that arithmetic."""
    assert ft_hash("") == 2166136261
    assert ft_hash("<he") == 1133188580
    assert ft_hash("hel") == 179613742
    assert ft_hash("llo") == 928617342
    assert ft_hash("lo>") == 2253504790
    # sign extension: every UTF-8 byte of these is >= 0x80
    assert ft_hash("ß") == 1325040919  # 'ß' (0xC3 0x9F)
    assert ft_hash("中文") == 1907909189  # '中文'


def test_subword_ngrams_ascii():
    """computeSubwords over '<hello>' with minn=3 maxn=6 (wiki.en.bin's
    training settings): every 3..6-char window, boundary chars included."""
    got = subword_ngrams("<hello>", 3, 6)
    want = [
        "<he", "<hel", "<hell", "<hello",
        "hel", "hell", "hello", "hello>",
        "ell", "ello", "ello>",
        "llo", "llo>",
        "lo>",
    ]
    assert got == want


def test_subword_ngrams_utf8_character_units():
    """n counts characters, not bytes: continuation bytes glue onto the
    current n-gram and never start one (dictionary.cc's 0xC0-mask walk)."""
    got = subword_ngrams("<über>", 3, 3)  # 'über': ü is 2 bytes
    assert got == ["<üb", "übe", "ber", "er>"]
    # lone boundary chars are skipped at n == 1 even when minn == 1
    got1 = subword_ngrams("<ab>", 1, 1)
    assert got1 == ["a", "b"]


@pytest.fixture(scope="module")
def tiny_bin(tmp_path_factory):
    rng = np.random.RandomState(7)
    words = [EOS, "hello", "world", "straße"]
    dim, bucket = 16, 64
    vecs = rng.randn(len(words), dim).astype(np.float32)
    ngram_vecs = rng.randn(bucket, dim).astype(np.float32)
    path = str(tmp_path_factory.mktemp("ft") / "tiny.bin")
    write_fasttext_bin(path, words, vecs, bucket=bucket, minn=3, maxn=6,
                       ngram_vectors=ngram_vecs)
    return path, words, vecs, ngram_vecs, bucket


def test_bin_roundtrip_header(tiny_bin):
    path, words, vecs, ngram_vecs, bucket = tiny_bin
    ft = FastTextBin(path)
    assert ft.get_dimension() == vecs.shape[1]
    assert ft.words == words
    assert ft.args["minn"] == 3 and ft.args["maxn"] == 6
    assert ft.input_matrix.shape == (len(words) + bucket, vecs.shape[1])
    np.testing.assert_array_equal(np.asarray(ft.input_matrix[: len(words)]),
                                  vecs)


def lib_mean(rows):
    """The native library's exact accumulation order (fasttext.cc
    getWordVector): sequential float32 row adds, then one float32 multiply
    by 1/n — NOT a float64 mean (last-ulp different). get_word_vector must
    match this bit-for-bit so the fallback agrees with machines that have
    the native lib."""
    acc = np.zeros_like(rows[0], dtype=np.float32)
    for r in rows:
        acc += np.asarray(r, np.float32)
    return acc * np.float32(1.0 / len(rows))


def test_get_word_vector_in_vocab_means_word_row_plus_ngrams(tiny_bin):
    """fasttext.cc getWordVector: mean over [word row] + bucket rows of
    every 3..6-gram of '<word>' at nwords + hash % bucket."""
    path, words, vecs, ngram_vecs, bucket = tiny_bin
    ft = FastTextBin(path)
    rows = [vecs[words.index("hello")]]
    rows += [
        ngram_vecs[ft_hash(ng) % bucket]
        for ng in subword_ngrams("<hello>", 3, 6)
    ]
    np.testing.assert_array_equal(ft.get_word_vector("hello"), lib_mean(rows))


def test_get_word_vector_oov_uses_ngrams_only(tiny_bin):
    path, words, vecs, ngram_vecs, bucket = tiny_bin
    ft = FastTextBin(path)
    assert "quux" not in ft.word2idx
    rows = [
        ngram_vecs[ft_hash(ng) % bucket]
        for ng in subword_ngrams("<quux>", 3, 6)
    ]
    np.testing.assert_array_equal(ft.get_word_vector("quux"), lib_mean(rows))


def test_eos_never_takes_ngrams(tiny_bin):
    """dictionary.cc getSubwords: EOS ('</s>') maps to its word row alone."""
    path, words, vecs, _, _ = tiny_bin
    ft = FastTextBin(path)
    np.testing.assert_allclose(ft.get_word_vector(EOS), vecs[0], atol=1e-6)


def test_non_ascii_word_roundtrip(tiny_bin):
    """'straße' exercises sign-extended hashing + multi-byte n-gram walk
    end-to-end through real file bytes."""
    path, words, vecs, ngram_vecs, bucket = tiny_bin
    ft = FastTextBin(path)
    w = "straße"
    rows = [vecs[words.index(w)]] + [
        ngram_vecs[ft_hash(ng) % bucket]
        for ng in subword_ngrams("<" + w + ">", 3, 6)
    ]
    np.testing.assert_array_equal(ft.get_word_vector(w), lib_mean(rows))


def test_maxn_zero_means_word_rows_only(tmp_path):
    """A model trained without subwords (maxn=0) serves exact word rows and
    zero vectors for OOV — the degenerate case the format allows."""
    words = ["alpha", "beta"]
    vecs = np.eye(2, 8, dtype=np.float32)
    path = str(tmp_path / "nosub.bin")
    write_fasttext_bin(path, words, vecs, bucket=4, minn=0, maxn=0)
    ft = FastTextBin(path)
    np.testing.assert_array_equal(ft.get_word_vector("alpha"), vecs[0])
    np.testing.assert_array_equal(ft.get_word_vector("nope"),
                                  np.zeros(8, np.float32))


def test_processor_falls_back_to_pure_reader(tiny_bin):
    """This container has no native fasttext lib, so FastTextProcessor
    (model_path=...) must transparently load through fasttext_bin and mean
    over space-split subwords exactly like the reference's WordToVectorDict
    (reference processors.py:96-102)."""
    with pytest.raises(ImportError):
        import fasttext  # noqa: F401  (the premise of the fallback)

    path, words, vecs, _, _ = tiny_bin
    proc = FastTextProcessor(model_path=path)
    assert not proc.is_fallback  # .bin loaded, not hash noise
    assert isinstance(proc.model, FastTextBin)
    out = proc(["hello", "hello world"], max_length=4)
    assert out.shape == (4, vecs.shape[1])
    ft = FastTextBin(path)
    np.testing.assert_allclose(out[0], ft.get_word_vector("hello"), atol=1e-6)
    want = np.mean(
        [ft.get_word_vector("hello"), ft.get_word_vector("world")], axis=0
    )
    np.testing.assert_allclose(out[1], want, atol=1e-6)
    np.testing.assert_array_equal(out[2:], 0.0)


def test_reader_rejects_quantized_and_garbage(tmp_path):
    bad = tmp_path / "garbage.bin"
    bad.write_bytes(b"\x01\x02\x03\x04" * 64)
    with pytest.raises(ValueError):
        FastTextBin(str(bad))
