"""Geometry core vs numpy oracles (SURVEY.md §7 step 1)."""

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.ops import (
    generate_anchors,
    generate_anchors_pre,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
)
from tests.conftest import random_boxes
from tests import oracles


def test_generate_anchors_classic_values():
    # The canonical 9 anchors for base 16, ratios [.5,1,2], scales [8,16,32]:
    # actual output of the lineage's python generate_anchors() (the docstring
    # table in the reference is the old 1-indexed MATLAB variant, +1 off).
    a = generate_anchors(16, (0.5, 1.0, 2.0), (8.0, 16.0, 32.0))
    assert a.shape == (9, 4)
    expected_first = np.array([-84.0, -40.0, 99.0, 55.0])
    expected_last = np.array([-168.0, -344.0, 183.0, 359.0])
    np.testing.assert_allclose(a[0], expected_first, atol=1e-4)
    np.testing.assert_allclose(a[-1], expected_last, atol=1e-4)
    # all anchors centred on (7.5, 7.5)
    cx = (a[:, 0] + a[:, 2]) / 2
    cy = (a[:, 1] + a[:, 3]) / 2
    np.testing.assert_allclose(cx, 7.5, atol=1e-4)
    np.testing.assert_allclose(cy, 7.5, atol=1e-4)


def test_generate_anchors_pre_shift_order():
    anchors, count = generate_anchors_pre(3, 4, 16)
    anchors = np.asarray(anchors)
    assert count == 3 * 4 * 9
    assert anchors.shape == (108, 4)
    base = generate_anchors(16)
    # row-major over cells, anchors contiguous per cell: index (y*W + x)*9 + a
    np.testing.assert_allclose(anchors[:9], base, atol=1e-5)
    np.testing.assert_allclose(anchors[9:18], base + np.array([16, 0, 16, 0]), atol=1e-5)
    np.testing.assert_allclose(
        anchors[4 * 9 : 4 * 9 + 9], base + np.array([0, 16, 0, 16]), atol=1e-5
    )


def test_bbox_transform_roundtrip(rng):
    ex = random_boxes(rng, 64)
    gt = random_boxes(rng, 64)
    deltas = np.asarray(bbox_transform(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(deltas, oracles.bbox_transform_np(ex, gt), rtol=1e-4, atol=1e-4)
    # clip=False: the decode-side exp clamp (log(1000/16)) intentionally caps
    # extreme size ratios; roundtrip identity needs the unclamped decode.
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex), jnp.asarray(deltas), clip=False))
    np.testing.assert_allclose(rec, gt, rtol=1e-3, atol=1e-2)


def test_bbox_transform_inv_multiclass(rng):
    boxes = random_boxes(rng, 32)
    deltas = rng.randn(32, 4 * 21).astype(np.float32) * 0.1
    out = np.asarray(bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(deltas)))
    np.testing.assert_allclose(
        out, oracles.bbox_transform_inv_np(boxes, deltas), rtol=1e-3, atol=1e-2
    )


def test_clip_boxes(rng):
    boxes = rng.uniform(-200, 1200, (50, 8)).astype(np.float32)
    out = np.asarray(clip_boxes(jnp.asarray(boxes), (600, 1000)))
    b = out.reshape(50, 2, 4)
    assert (b[..., 0] >= 0).all() and (b[..., 2] <= 999).all()
    assert (b[..., 1] >= 0).all() and (b[..., 3] <= 599).all()
    inside = np.clip(boxes.reshape(50, 2, 4), [0, 0, 0, 0], [999, 599, 999, 599])
    np.testing.assert_allclose(b, inside, atol=1e-5)


def test_clip_boxes_batched(rng):
    boxes = rng.uniform(-50, 900, (2, 10, 4)).astype(np.float32)
    shapes = np.array([[600.0, 800.0], [300.0, 400.0]], dtype=np.float32)
    out = np.asarray(clip_boxes(jnp.asarray(boxes), jnp.asarray(shapes)))
    assert out[0, :, 2].max() <= 799 and out[1, :, 2].max() <= 399
    assert out[0, :, 3].max() <= 599 and out[1, :, 3].max() <= 299


def test_bbox_overlaps(rng):
    boxes = random_boxes(rng, 40)
    query = random_boxes(rng, 25)
    got = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(query)))
    want = oracles.bbox_overlaps_np(boxes, query)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # identity: IoU(b, b) == 1
    self_iou = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, atol=1e-5)
