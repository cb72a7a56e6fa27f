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


def generate_anchors(base_size=16, ratios=(0.5, 1.0, 2.0), scales=(8.0, 16.0, 32.0)):
    """The len(ratios)*len(scales) base anchors around a base_size box.

    One vectorized enumeration (the lineage chains four tiny helpers; the
    math is identical and pinned bit-exact by the value-table test in
    tests/test_geometry.py):

      * start from the inclusive base box [0, 0, s-1, s-1], center c,
        area s^2;
      * per ratio r: width = round(sqrt(s^2 / r)), height = round(width * r)
        — the two Caffe roundings that make e.g. the 16px ratio-0.5 anchor
        23x12, not 22.6x11.3;
      * per scale k: multiply that (width, height) by k around the SAME
        center c (no re-rounding);
      * row order is ratio-major: row = r_idx * len(scales) + s_idx.

    Returns float32 (A, 4); pure host-side constant computation (once per
    model build, never in-graph).
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    center = (base_size - 1.0) / 2.0
    ratio_w = np.round(np.sqrt(base_size * base_size / ratios))   # (R,)
    ratio_h = np.round(ratio_w * ratios)                          # (R,)
    w = (ratio_w[:, None] * scales[None, :]).reshape(-1)          # (R*S,)
    h = (ratio_h[:, None] * scales[None, :]).reshape(-1)
    anchors = np.stack([center - 0.5 * (w - 1.0), center - 0.5 * (h - 1.0),
                        center + 0.5 * (w - 1.0), center + 0.5 * (h - 1.0)],
                       axis=1)
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
