"""Spatial graph op tests: the vectorized builder must reproduce the
reference's scalar double loop bit-for-bit, and the (13,12) relation LUT must
match the reference's one-hot-union expansion."""

import os
import sys

import numpy as np
import pytest

from sam_textvqa_tpu.ops.spatial_graph import (
    _build_spatial_graph_numpy,
    build_shared_graphs,
    build_spatial_graph,
    native_available,
    relation_head_lut,
    rotate_classes,
    spatial_head_mask_from_classes,
)

from conftest import REFERENCE_ROOT, reference_available


def random_boxes(rng, n, n_pad=0):
    b = rng.rand(n, 4)
    b[:, 2:] = b[:, :2] + b[:, 2:] * (1 - b[:, :2])  # valid xmax>xmin etc.
    if n_pad:
        b[rng.choice(n, n_pad, replace=False)] = 0.0
    return b


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("threshold", [0.5, 0.25])
def test_matches_reference_scalar_loop(seed, threshold):
    sys.path.insert(0, REFERENCE_ROOT)
    from sam.spatial_utils import build_graph_using_normalized_boxes

    rng = np.random.RandomState(seed)
    boxes = random_boxes(rng, 24, n_pad=4)
    ref = build_graph_using_normalized_boxes(
        boxes, distance_threshold=threshold
    )
    ours = build_shared_graphs(boxes, distance_threshold=threshold)
    for key in ref:
        np.testing.assert_array_equal(ours[key], ref[key], err_msg=key)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_matches_reference_with_duplicates_and_containment():
    sys.path.insert(0, REFERENCE_ROOT)
    from sam.spatial_utils import build_graph_using_normalized_boxes

    boxes = np.array(
        [
            [0.1, 0.1, 0.9, 0.9],   # big box
            [0.2, 0.2, 0.8, 0.8],   # strictly inside 0
            [0.2, 0.2, 0.8, 0.8],   # duplicate of 1 (overlap, IoU=1)
            [0.1, 0.5, 0.9, 0.52],  # same center as 0, thin (no containment)
            [0.05, 0.5, 0.1, 0.55],  # left of center
            [0.9, 0.5, 0.95, 0.55],  # right of center
            [0.0, 0.0, 0.0, 0.0],   # padded
        ]
    )
    ref = build_graph_using_normalized_boxes(boxes)
    ours = build_shared_graphs(boxes)
    for key in ref:
        np.testing.assert_array_equal(ours[key], ref[key], err_msg=key)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_lut_matches_reference_onehot_union():
    """LUT expansion == reference torch_broadcast_adj_matrix + torch.max union
    (reference textvqa_dataset.py:378-409)."""
    sys.path.insert(0, REFERENCE_ROOT)
    import torch
    from sam.spatial_utils import (
        build_graph_using_normalized_boxes,
        torch_broadcast_adj_matrix,
    )

    rng = np.random.RandomState(7)
    boxes = random_boxes(rng, 20, n_pad=3)
    shared = build_graph_using_normalized_boxes(boxes)

    def oh(key):
        return torch_broadcast_adj_matrix(torch.from_numpy(shared[key]))

    ref_ctx = {"1": oh("1")}
    build_map = {
        "3": ["1", "31", "32"],
        "5": ["3", "51", "52"],
        "7": ["5", "71", "72"],
        "9": ["7", "91", "92"],
    }
    for ctx, (base, plus, minus) in build_map.items():
        m = torch.max(torch.max(ref_ctx[base], oh(plus)), oh(minus))
        ref_ctx[ctx] = m

    classes = build_spatial_graph(boxes)
    for ctx in ["1", "3", "5", "7", "9"]:
        lut = relation_head_lut(ctx)
        ours = np.asarray(
            spatial_head_mask_from_classes(classes, lut.astype(np.float32))
        )
        np.testing.assert_array_equal(
            ours, ref_ctx[ctx].numpy().astype(np.float32), err_msg=ctx
        )


def test_self_and_padding():
    boxes = np.array(
        [[0.1, 0.1, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0], [0.6, 0.6, 0.8, 0.8]]
    )
    c = build_spatial_graph(boxes)
    assert c[0, 0] == 12 and c[2, 2] == 12
    assert c[1].sum() == 0 and c[:, 1].sum() == 0


def test_rotation_arithmetic():
    c = np.array([[0, 1, 2, 3, 4, 7, 11, 12]], dtype=np.int8)
    r = rotate_classes(c, 1)
    np.testing.assert_array_equal(r, [[0, 0, 0, 0, 5, 8, 4, 0]])
    r = rotate_classes(c, -1)
    np.testing.assert_array_equal(r, [[0, 0, 0, 0, 11, 6, 10, 0]])


def test_batched_equals_per_sample():
    rng = np.random.RandomState(3)
    batch = np.stack([random_boxes(rng, 12, 2) for _ in range(4)])
    joint = build_spatial_graph(batch)
    for i in range(4):
        np.testing.assert_array_equal(joint[i], build_spatial_graph(batch[i]))


@pytest.mark.skipif(not native_available(), reason="libsamspatial.so absent")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_bit_equals_numpy(seed):
    """csrc/spatialgraph.cc must be byte-identical to the numpy path (which
    the oracle tests above prove against the reference scalar loop). Covers
    batched + padded + duplicate-row (coincident-center NaN-angle) cases and
    the serving shape (N=150)."""
    rng = np.random.RandomState(seed)
    for n, n_pad in [(1, 0), (7, 3), (24, 4), (150, 110)]:
        batch = np.stack([random_boxes(rng, n, n_pad) for _ in range(3)])
        if n > 2:
            batch[:, 1] = batch[:, 0]  # duplicates: dist==0 -> class 4
        for thr in (0.5, 0.25):
            np.testing.assert_array_equal(
                build_spatial_graph(batch, thr),
                _build_spatial_graph_numpy(batch, thr),
                err_msg=f"n={n} thr={thr}",
            )


@pytest.mark.skipif(not native_available(), reason="libsamspatial.so absent")
def test_native_threaded_batch_bit_equals_serial():
    """The native pass fans a batch out over worker threads (samples are
    independent); forcing a 3-thread pool must not change a byte vs the
    single-thread walk, even on a 1-core host."""
    rng = np.random.RandomState(11)
    batch = np.stack([random_boxes(rng, 40, 10) for _ in range(31)])
    serial = build_spatial_graph(batch, threads=1)
    np.testing.assert_array_equal(serial, build_spatial_graph(batch, threads=3))
    np.testing.assert_array_equal(serial, _build_spatial_graph_numpy(batch))
