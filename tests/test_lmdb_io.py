"""Real-LMDB byte format: the pure-Python writer/reader pair
(data/lmdb_io.py) and LmdbFeatureSource over actual data.mdb files — the
format the reference ships features in (reference
sam/datasets/_image_features_reader.py:66-76). py-lmdb is absent in this
container, so these tests are what proves the binary layout; a skip-gated
cross-validation against the real library runs wherever it is installed."""

import os
import pickle
import struct

import numpy as np
import pytest

from sam_textvqa_tpu.data.lmdb_io import (
    MDB_MAGIC,
    PSIZE,
    MiniLmdbReader,
    write_lmdb,
    write_reference_feature_lmdb,
)


def _rand_items(rng, n, big_every=0, keylen=8):
    items = {}
    for i in range(n):
        key = bytes(rng.randint(97, 123, size=keylen, dtype=np.uint8)) + b"%06d" % i
        if big_every and i % big_every == 0:
            value = rng.bytes(rng.randint(3000, 20000))  # overflow chains
        else:
            value = rng.bytes(rng.randint(0, 400))
        items[key] = value
    return items


def test_roundtrip_small(tmp_path):
    items = {b"alpha": b"1", b"beta": b"x" * 100, b"": b"empty-key", b"z": b""}
    write_lmdb(str(tmp_path / "env"), items)
    r = MiniLmdbReader(str(tmp_path / "env"))
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get(b"missing") is None
    assert list(r.items()) == sorted(items.items())


def test_roundtrip_overflow_and_branches(tmp_path):
    """Values past NODEMAX go to multi-page overflow chains; 400 keys force
    multiple leaves and a branch level. Every byte must survive."""
    rng = np.random.RandomState(0)
    items = _rand_items(rng, 400, big_every=23)
    write_lmdb(str(tmp_path / "env"), items)
    r = MiniLmdbReader(str(tmp_path / "env"))
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get(b"\xff" * 8) is None
    assert [k for k, _ in r.items()] == sorted(items)


def test_roundtrip_deep_tree(tmp_path):
    """500-byte keys shrink the fanout to ~8/page, forcing TWO branch
    levels (depth 3) — exercises multi-level descent."""
    rng = np.random.RandomState(1)
    items = {
        bytes(rng.randint(97, 123, size=500, dtype=np.uint8)): b"%d" % i
        for i in range(120)
    }
    write_lmdb(str(tmp_path / "env"), items)
    r = MiniLmdbReader(str(tmp_path / "env"))
    for k, v in items.items():
        assert r.get(k) == v
    assert len(list(r.items())) == 120


def test_meta_election(tmp_path):
    """Readers must take the twin meta page with the LARGER txnid — write
    a stale meta 0 pointing at an empty tree and confirm lookups still hit
    the live meta 1 snapshot."""
    items = {b"k%03d" % i: b"v%d" % i for i in range(50)}
    data = write_lmdb(str(tmp_path / "env"), items)
    raw = bytearray(open(data, "rb").read())
    assert len(raw) % PSIZE == 0
    magic, = struct.unpack_from("<I", raw, 16)
    assert magic == MDB_MAGIC
    # corrupt meta 0's root to P_INVALID (empty tree), txnid stays 0
    struct.pack_into("<Q", raw, 16 + 24 + 48 + 40, 0xFFFFFFFFFFFFFFFF)
    open(data, "wb").write(raw)
    r = MiniLmdbReader(data)
    assert r.get(b"k007") == b"v7"


def test_feature_source_over_real_lmdb_bytes(tmp_path):
    """LmdbFeatureSource end-to-end over an actual data.mdb: the reference
    serialized layout (pickled keys entry + per-image pickle records with
    (N, 2048) float32 features — real-sized rows, i.e. overflow-backed
    values) must yield the same (features, normalized boxes) as the
    in-memory source."""
    from sam_textvqa_tpu.data.features import (
        DictFeatureSource,
        LmdbFeatureSource,
        open_feature_source,
    )

    rng = np.random.RandomState(2)
    images = {}
    for i in range(5):
        n = rng.randint(3, 30)
        boxes = rng.rand(n, 4).astype(np.float32) * 100
        boxes[:, 2:] += boxes[:, :2] + 5
        images[f"img{i}"] = {
            "features": rng.randn(n, 2048).astype(np.float32),
            "boxes": boxes,
            "image_w": 200,
            "image_h": 100,
        }
    write_reference_feature_lmdb(str(tmp_path / "feats"), images)

    src = LmdbFeatureSource(str(tmp_path / "feats"))
    ref = DictFeatureSource(images)
    for image_id in images:
        assert image_id in src
        f, b = src.get(image_id)
        rf, rb = ref.get(image_id)
        np.testing.assert_array_equal(f, rf)
        np.testing.assert_array_equal(b, rb)
    assert "nope" not in src
    # open_feature_source auto-detects the data.mdb directory
    assert isinstance(open_feature_source(str(tmp_path / "feats")),
                      LmdbFeatureSource)


def test_feature_source_image_id_rebasing_over_lmdb(tmp_path):
    """ST-VQA path surgery (reference _image_features_reader.py:94-117)
    through the real byte path: keys stored under a foreign extraction
    root resolve from dataset-derived ids."""
    from sam_textvqa_tpu.data.features import LmdbFeatureSource

    rng = np.random.RandomState(3)
    root = "/extract/root/scene-text/task3/train"
    images = {
        f"{root}/im{i}.jpg": {
            "features": rng.randn(4, 2048).astype(np.float32),
            "boxes": np.array([[1, 2, 30, 40]] * 4, np.float32),
            "image_w": 64,
            "image_h": 64,
        }
        for i in range(3)
    }
    write_reference_feature_lmdb(str(tmp_path / "st"), images)
    src = LmdbFeatureSource(str(tmp_path / "st"))
    # the dataset derives ids under ITS root; the stored sample key donates
    # the extraction root
    assert "data/scene-text/task3/train/im1.jpg" in src
    f, _ = src.get("data/scene-text/task3/train/im1.jpg")
    np.testing.assert_array_equal(f, images[f"{root}/im1.jpg"]["features"])


def test_cross_validate_against_py_lmdb(tmp_path):
    """Wherever the real library exists, our written files must open and
    read back through it, and our reader must read files IT wrote."""
    lmdb = pytest.importorskip("lmdb")
    rng = np.random.RandomState(4)
    items = _rand_items(rng, 200, big_every=17)

    ours = str(tmp_path / "ours")
    write_lmdb(ours, items)
    env = lmdb.open(ours, readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, k

    theirs = str(tmp_path / "theirs")
    os.makedirs(theirs)
    env2 = lmdb.open(theirs, map_size=64 << 20)
    with env2.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env2.sync()
    r = MiniLmdbReader(theirs)
    for k, v in items.items():
        assert r.get(k) == v, k
