"""RoI feature extraction (jnp reference impls) vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.ops.roi_align import (roi_align, roi_align_gather,
                                     roi_align_multilevel, roi_pool,
                                     crop_and_resize_pool)
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


def test_roi_align_multilevel_matches_per_level(rng):
    """One-pass multilevel gather == per-level roi_align_gather selected by
    the roi's assigned level (the FPN _pool contract)."""
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(64 // (s // 4), 96 // (s // 4), 8)
                         .astype(np.float32)) for s in strides]
    r = 32
    rois = random_boxes(rng, r, width=96 * 4 - 1, height=64 * 4 - 1, min_size=8)
    levels = rng.randint(0, 4, size=r).astype(np.int32)

    got = np.asarray(roi_align_multilevel(
        feats, jnp.asarray(rois), jnp.asarray(levels), strides,
        output_size=7, sampling_ratio=2, chunk=16))
    for li, (f, s) in enumerate(zip(feats, strides)):
        want = np.asarray(roi_align_gather(
            f, jnp.asarray(rois), output_size=7, spatial_scale=1.0 / s,
            sampling_ratio=2))
        sel = levels == li
        np.testing.assert_allclose(got[sel], want[sel], rtol=1e-4, atol=1e-4)


def test_roi_align_multilevel_grad_matches_reference(rng):
    """The custom VJP (row-wise scatter-add backward — XLA's transpose of
    the (2, C)-slice gather is pathologically slow on TPU) must equal the
    autodiff gradient of the masked per-level roi_align_gather formulation:
    RoIAlign is linear in the features, so the adjoint is unique."""
    import jax

    strides = [4, 8, 16]
    feats = [jnp.asarray(rng.randn(48 // (s // 4), 64 // (s // 4), 8)
                         .astype(np.float32)) for s in strides]
    r = 16
    rois = random_boxes(rng, r, width=255, height=191, min_size=6)
    levels = jnp.asarray(rng.randint(0, 3, size=r).astype(np.int32))
    cot = jnp.asarray(rng.randn(r, 7, 7, 8).astype(np.float32))

    def ml(fs):
        return jnp.vdot(cot, roi_align_multilevel(
            fs, jnp.asarray(rois), levels, strides, chunk=8))

    def ref(fs):
        out = None
        for li, (f, s) in enumerate(zip(fs, strides)):
            pooled = roi_align_gather(f, jnp.asarray(rois),
                                      output_size=7, spatial_scale=1.0 / s,
                                      sampling_ratio=2)
            m = (np.asarray(levels) == li)[:, None, None, None]
            pooled = pooled * jnp.asarray(m, jnp.float32)
            out = pooled if out is None else out + pooled
        return jnp.vdot(cot, out)

    g_ml = jax.grad(ml)(feats)
    g_ref = jax.grad(ref)(feats)
    total = 0.0
    for a, b in zip(g_ml, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
        total += np.abs(np.asarray(b)).sum()
    assert total > 0


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
