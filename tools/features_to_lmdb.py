#!/usr/bin/env python
"""Pack image features into the reference's shipping LMDB layout.

Usage:
    # from a directory of <image_id>.npz files (features/boxes/image_w/image_h)
    python tools/features_to_lmdb.py --npz_dir feats/ --out feats_trainval.lmdb

    # verify an existing LMDB (ours or the reference's) end-to-end:
    python tools/features_to_lmdb.py --check feats_trainval.lmdb

The writer emits actual data.mdb bytes (sam_textvqa_tpu/data/lmdb_io.py) in
the serialized record layout the reference reader expects (reference
sam/datasets/_image_features_reader.py:66-188: pickled ``keys`` entry +
``{features, boxes, image_h, image_w, num_boxes}`` per image id) — py-lmdb
opens the result unchanged. --check walks every record through
LmdbFeatureSource and prints a summary line.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_npz_dir(npz_dir):
    images = {}
    for name in sorted(os.listdir(npz_dir)):
        if not name.endswith(".npz"):
            continue
        with np.load(os.path.join(npz_dir, name)) as z:
            images[name[:-4].replace("__", "/")] = {
                "features": np.asarray(z["features"], np.float32),
                "boxes": np.asarray(z["boxes"], np.float32),
                "image_w": float(z["image_w"]),
                "image_h": float(z["image_h"]),
            }
    return images


def check(path):
    from sam_textvqa_tpu.data.features import open_lmdb_kv

    kv = open_lmdb_kv(path)
    keys = pickle.loads(kv.get(b"keys"))
    n_rows = 0
    for k in keys:
        item = pickle.loads(kv.get(k))
        feats = np.asarray(item["features"], np.float32).reshape(-1, 2048)
        boxes = np.asarray(item["boxes"], np.float32).reshape(-1, 4)
        assert feats.shape[0] == boxes.shape[0], k
        assert np.isfinite(feats).all() and np.isfinite(boxes).all(), k
        assert item["image_w"] > 0 and item["image_h"] > 0, k
        n_rows += feats.shape[0]
    print(f"ok: {len(keys)} images, {n_rows} regions, "
          f"first key {keys[0].decode()!r}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz_dir", help="directory of <image_id>.npz files")
    p.add_argument("--out", help="output LMDB environment directory")
    p.add_argument("--check", help="verify an LMDB feature file instead")
    args = p.parse_args()

    if args.check:
        check(args.check)
        return
    if not (args.npz_dir and args.out):
        p.error("--npz_dir and --out are required (or use --check)")
    from sam_textvqa_tpu.data.lmdb_io import write_reference_feature_lmdb

    images = load_npz_dir(args.npz_dir)
    data = write_reference_feature_lmdb(args.out, images)
    print(f"wrote {len(images)} images to {data} "
          f"({os.path.getsize(data) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
