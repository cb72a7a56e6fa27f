"""RoI feature extraction (jnp reference impls) vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.ops.roi_align import roi_align, roi_pool, crop_and_resize_pool
from tests.conftest import random_boxes
from tests import oracles


def _feat_and_rois(rng, h=24, w=32, c=8, r=12, stride=16):
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = random_boxes(rng, r, width=w * stride - 1, height=h * stride - 1, min_size=16)
    return feat, rois


def test_roi_align_matches_oracle(rng):
    feat, rois = _feat_and_rois(rng)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 2))
    want = oracles.roi_align_np(feat, rois, 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_chunked_equals_unchunked(rng):
    feat, rois = _feat_and_rois(rng, r=64)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), chunk=16))
    b = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), chunk=64))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_roi_align_tiny_roi(rng):
    # degenerate rois (w or h < 1 feature cell) must not NaN
    feat, _ = _feat_and_rois(rng)
    rois = np.array([[100.0, 100.0, 102.0, 101.0], [0.0, 0.0, 3.0, 3.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois)))
    assert np.isfinite(got).all()
    want = oracles.roi_align_np(feat, rois)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_grad_flows(rng):
    import jax

    feat, rois = _feat_and_rois(rng, h=8, w=8, c=4, r=4)
    g = jax.grad(lambda f: roi_align(f, jnp.asarray(rois)).sum())(jnp.asarray(feat))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_roi_pool_matches_oracle(rng):
    feat, rois = _feat_and_rois(rng)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0))
    want = oracles.roi_pool_np(feat, rois, 7, 1 / 16.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_crop_and_resize_pool_shape_and_sanity(rng):
    feat, rois = _feat_and_rois(rng)
    out = np.asarray(crop_and_resize_pool(jnp.asarray(feat), jnp.asarray(rois), 7))
    assert out.shape == (12, 7, 7, 8)
    assert np.isfinite(out).all()
    # constant feature map → constant crops (bilinear preserves constants)
    const = np.full_like(feat, 3.25)
    out_c = np.asarray(crop_and_resize_pool(jnp.asarray(const), jnp.asarray(rois), 7))
    np.testing.assert_allclose(out_c, 3.25, rtol=1e-5)
