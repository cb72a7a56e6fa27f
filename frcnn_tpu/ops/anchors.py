"""Anchor generation.

Semantics match the reference's classic anchor enumeration
(``lib/layer_utils/generate_anchors.py:~1-100`` and ``snippets.py:~1-30``,
SURVEY.md #12): a base ``stride x stride`` box centred the Caffe way, expanded
to ``len(ratios)`` aspect ratios then ``len(scales)`` scales, then shifted over
the feature grid.  Anchors are (x1, y1, x2, y2), *inclusive* corner
convention (widths are ``x2 - x1 + 1``), exactly like the lineage.

TPU-first notes: everything here is static given (height, width) — the grid is
enumerated with broadcasted iota, no Python loops over cells, and the result is
a constant folded into the jitted graph (the reference recomputes it on the
host each forward, ``network.py:~_anchor_component``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    x_ctr = anchor[0] + 0.5 * (w - 1.0)
    y_ctr = anchor[1] + 0.5 * (h - 1.0)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1.0),
            y_ctr - 0.5 * (hs - 1.0),
            x_ctr + 0.5 * (ws - 1.0),
            y_ctr + 0.5 * (hs - 1.0),
        )
    )


def _ratio_enum(anchor, ratios):
    """Enumerate aspect ratios: round(sqrt(area/ratio)) widths, Caffe rounding."""
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * scales
    hs = h * scales
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def generate_anchors(base_size=16, ratios=(0.5, 1.0, 2.0), scales=(8.0, 16.0, 32.0)):
    """The 9 (or len(ratios)*len(scales)) base anchors around a base_size box.

    Returns a float32 numpy array of shape (A, 4); this is pure host-side
    constant computation (it happens once per model build, never in-graph).
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base_anchor = np.array([0.0, 0.0, base_size - 1.0, base_size - 1.0])
    ratio_anchors = _ratio_enum(base_anchor, ratios)
    anchors = np.vstack(
        [_scale_enum(ratio_anchors[i, :], scales) for i in range(ratio_anchors.shape[0])]
    )
    return anchors.astype(np.float32)


@partial(jax.jit, static_argnums=(0, 1, 2), static_argnames=("ratios", "scales"))
def generate_anchors_pre(height: int, width: int, feat_stride: int,
                         ratios=(0.5, 1.0, 2.0), scales=(8.0, 16.0, 32.0)):
    """Shift the base anchors over an (height, width) feature grid.

    Matches reference ``snippets.generate_anchors_pre``: shift order is
    row-major over cells with the A anchors contiguous per cell, i.e. the
    output row index is ``(y * width + x) * A + a``.  Returns
    ``(height*width*A, 4)`` float32.
    """
    base = jnp.asarray(generate_anchors(feat_stride, ratios, scales))
    a = base.shape[0]
    shift_x = jnp.arange(width, dtype=jnp.float32) * feat_stride
    shift_y = jnp.arange(height, dtype=jnp.float32) * feat_stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # (H, W) each, row-major
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (H*W,1,4)
    anchors = base[None, :, :] + shifts  # (H*W, A, 4)
    return anchors.reshape(-1, 4), height * width * a
