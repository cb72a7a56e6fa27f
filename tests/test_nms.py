"""NMS (jnp reference impls) vs the classic greedy numpy oracle."""

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.ops.nms import nms_mask, nms_mask_simple, nms_fixed, batched_class_nms
from tests.conftest import random_boxes
from tests import oracles


def _sorted_dets(rng, n, cluster=True):
    if cluster:
        # clustered boxes to force plenty of suppression
        centers = random_boxes(rng, max(n // 10, 1))
        reps = centers[rng.randint(0, centers.shape[0], n)]
        jitter = rng.randn(n, 4).astype(np.float32) * 8.0
        boxes = reps + jitter
        boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 1)
        boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 1)
    else:
        boxes = random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    return boxes[order], scores[order]


def test_nms_simple_matches_oracle(rng):
    for thresh in (0.3, 0.5, 0.7):
        boxes, scores = _sorted_dets(rng, 200)
        keep = np.asarray(nms_mask_simple(jnp.asarray(boxes), thresh))
        dets = np.concatenate([boxes, scores[:, None]], axis=1)
        want = sorted(oracles.nms_np(dets, thresh))
        got = np.nonzero(keep)[0].tolist()
        assert got == want


def test_nms_blocked_matches_simple(rng):
    for n in (64, 128, 300, 1000):
        boxes, _ = _sorted_dets(rng, n)
        simple = np.asarray(nms_mask_simple(jnp.asarray(boxes), 0.7))
        blocked = np.asarray(nms_mask(jnp.asarray(boxes), 0.7))
        np.testing.assert_array_equal(simple, blocked)


def test_nms_blocked_respects_validity(rng):
    boxes, _ = _sorted_dets(rng, 256)
    valid = np.ones(256, bool)
    valid[200:] = False
    keep = np.asarray(nms_mask(jnp.asarray(boxes), 0.7, jnp.asarray(valid)))
    assert not keep[200:].any()
    # invalid boxes must not suppress: result on the valid prefix is the same
    keep_prefix = np.asarray(nms_mask(jnp.asarray(boxes[:200]), 0.7))
    np.testing.assert_array_equal(keep[:200], keep_prefix)


def test_nms_fixed_padding_contract(rng):
    boxes, scores = _sorted_dets(rng, 300)
    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.7, 128,
                           use_pallas=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx.shape == (128,) and valid.shape == (128,)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = oracles.nms_np(dets, 0.7)[:128]
    got = idx[valid].tolist()
    assert got == want  # kept indices in descending-score order
    # valid flags are a prefix
    first_invalid = np.argmin(valid) if not valid.all() else 128
    assert valid[:first_invalid].all() and not valid[first_invalid:].any()


def test_batched_class_nms(rng):
    c, n = 4, 100
    boxes = np.stack([_sorted_dets(rng, n)[0] for _ in range(c)])
    scores = rng.uniform(0, 1, (c, n)).astype(np.float32)
    idx, keep = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3, 20,
                                  use_pallas=False)
    idx, keep = np.asarray(idx), np.asarray(keep)
    assert idx.shape == (c, 20)
    for j in range(c):
        dets = np.concatenate([boxes[j], scores[j][:, None]], axis=1)
        want = oracles.nms_np(dets, 0.3)[:20]
        assert idx[j][keep[j]].tolist() == want
