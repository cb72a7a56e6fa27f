"""Box transforms and pairwise IoU.

Semantics match reference ``lib/model/bbox_transform.py:~10-120`` (SURVEY.md
#18) and ``lib/utils/bbox.pyx:~1-60`` (#21): inclusive-corner boxes
(w = x2 - x1 + 1), (dx, dy, dw, dh) delta parameterization with exp on the
size deltas.

TPU-first notes: all functions are shape-polymorphic pure jnp, batched via
broadcasting; ``bbox_overlaps`` is a plain vectorized broadcast (XLA fuses the
whole thing — the reference needed Cython because numpy loops were too slow;
here no kernel is warranted, per SURVEY.md §2.4/#21).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# exp clamp matching the lineage's guard against overflow in decode
# (bbox_transform_inv clips dw, dh to log(1000/16) in detectron-family code;
# the reference lineage relies on fp32 exp with no clamp, but training with a
# clamp is strictly safer and identical in-range — documented deviation).
# NOTE: host math, not jnp — a module-level jnp op would initialize the
# device backend at import time (observed: dataset-only tools blocking on
# the TPU tunnel just to import box utilities).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def bbox_transform(ex_rois, gt_rois, eps: float = 1e-14):
    """Encode gt boxes relative to example (anchor/proposal) boxes.

    ex_rois, gt_rois: (..., 4) -> (..., 4) deltas (dx, dy, dw, dh).
    Reference ``bbox_transform(ex_rois, gt_rois)``.
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / jnp.maximum(ex_w, eps)
    dy = (gt_cy - ex_cy) / jnp.maximum(ex_h, eps)
    dw = jnp.log(jnp.maximum(gt_w, eps) / jnp.maximum(ex_w, eps))
    dh = jnp.log(jnp.maximum(gt_h, eps) / jnp.maximum(ex_h, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes, deltas, clip: bool = True):
    """Decode deltas on top of boxes.

    boxes: (..., 4); deltas: (..., 4*K) for K classes (class-major groups of
    4, like the reference) or (..., 4).  Returns same shape as deltas.
    Reference ``bbox_transform_inv(boxes, deltas)``.
    """
    boxes = boxes.astype(deltas.dtype)
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    lead = deltas.shape[:-1]
    d = deltas.reshape(lead + (-1, 4))
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    if clip:
        dw = jnp.minimum(dw, BBOX_XFORM_CLIP)
        dh = jnp.minimum(dh, BBOX_XFORM_CLIP)

    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcx + 0.5 * pw - 1.0,
            pcy + 0.5 * ph - 1.0,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes, im_shape):
    """Clip boxes (..., 4*K) to image bounds [0, W-1] x [0, H-1].

    im_shape: (height, width) — scalars or per-batch (..., 2) broadcastable.
    Reference ``clip_boxes(boxes, im_shape)``.
    """
    im_shape = jnp.asarray(im_shape, dtype=boxes.dtype)
    h = im_shape[..., 0]
    w = im_shape[..., 1]
    lead = boxes.shape[:-1]
    b = boxes.reshape(lead + (-1, 4))
    # broadcast h/w up to b's leading dims
    while h.ndim < b.ndim - 1:
        h = h[..., None]
        w = w[..., None]
    x1 = jnp.clip(b[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(b[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(b[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(b[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)


def bbox_overlaps(boxes, query_boxes):
    """Pairwise IoU: (N, 4) x (K, 4) -> (N, K).

    Reference ``lib/utils/bbox.pyx`` semantics: inclusive corners, zero overlap
    when no intersection.  Plain broadcastable jnp; also works batched as
    (..., N, 4) x (..., K, 4) -> (..., N, K).
    """
    b = boxes[..., :, None, :]
    q = query_boxes[..., None, :, :]
    iw = (
        jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + 1.0
    )
    ih = (
        jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + 1.0
    )
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_b = (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)
    area_q = (query_boxes[..., 2] - query_boxes[..., 0] + 1.0) * (
        query_boxes[..., 3] - query_boxes[..., 1] + 1.0
    )
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)
