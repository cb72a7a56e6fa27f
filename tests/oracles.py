"""Numpy oracles: independent transcriptions of the classic Faster R-CNN
algorithms (greedy NMS, box transforms, IoU, RoIAlign bilinear math), used as
numerical ground truth for the jnp/Pallas implementations (SURVEY.md §4:
"pure-function unit tests for every op vs numpy oracle")."""

from __future__ import annotations

import numpy as np


def bbox_overlaps_np(boxes, query):
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    for i in range(n):
        for j in range(k):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                ua = (
                    (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                    + (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
                    - iw * ih
                )
                out[i, j] = iw * ih / ua
    return out


def nms_np(dets, thresh):
    """Classic greedy NMS: dets (N, 5) [x1,y1,x2,y2,score] -> kept indices."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def bbox_transform_np(ex, gt):
    ex_w = ex[:, 2] - ex[:, 0] + 1.0
    ex_h = ex[:, 3] - ex[:, 1] + 1.0
    ex_cx = ex[:, 0] + 0.5 * ex_w
    ex_cy = ex[:, 1] + 0.5 * ex_h
    gt_w = gt[:, 2] - gt[:, 0] + 1.0
    gt_h = gt[:, 3] - gt[:, 1] + 1.0
    gt_cx = gt[:, 0] + 0.5 * gt_w
    gt_cy = gt[:, 1] + 0.5 * gt_h
    return np.stack(
        [
            (gt_cx - ex_cx) / ex_w,
            (gt_cy - ex_cy) / ex_h,
            np.log(gt_w / ex_w),
            np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def bbox_transform_inv_np(boxes, deltas):
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    out = np.zeros_like(deltas)
    for k in range(deltas.shape[1] // 4):
        dx, dy, dw, dh = (deltas[:, 4 * k + i] for i in range(4))
        pcx = dx * w + cx
        pcy = dy * h + cy
        pw = np.exp(dw) * w
        ph = np.exp(dh) * h
        out[:, 4 * k + 0] = pcx - 0.5 * pw
        out[:, 4 * k + 1] = pcy - 0.5 * ph
        out[:, 4 * k + 2] = pcx + 0.5 * pw - 1.0
        out[:, 4 * k + 3] = pcy + 0.5 * ph - 1.0
    return out


def _bilinear_np(feat, y, x):
    """torchvision RoIAlign bilinear sample with border semantics."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], dtype=feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def roi_align_np(feat, rois, output_size=7, spatial_scale=1.0 / 16.0, sampling_ratio=2):
    """RoIAlign oracle (torchvision aligned=False, fixed sampling ratio)."""
    r = rois.shape[0]
    p = output_size
    c = feat.shape[2]
    out = np.zeros((r, p, p, c), dtype=np.float64)
    for ri in range(r):
        x1, y1, x2, y2 = rois[ri] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / p
        bin_h = roi_h / p
        for ph in range(p):
            for pw in range(p):
                acc = np.zeros(c)
                for iy in range(sampling_ratio):
                    for ix in range(sampling_ratio):
                        y = y1 + (ph + (iy + 0.5) / sampling_ratio) * bin_h
                        x = x1 + (pw + (ix + 0.5) / sampling_ratio) * bin_w
                        acc += _bilinear_np(feat, y, x)
                out[ri, ph, pw] = acc / (sampling_ratio**2)
    return out


def roi_pool_np(feat, rois, output_size=7, spatial_scale=1.0 / 16.0):
    """Quantized RoIPool oracle."""
    r = rois.shape[0]
    p = output_size
    c = feat.shape[2]
    h, w = feat.shape[:2]
    out = np.zeros((r, p, p, c), dtype=feat.dtype)
    for ri in range(r):
        x1 = round(rois[ri, 0] * spatial_scale)
        y1 = round(rois[ri, 1] * spatial_scale)
        x2 = round(rois[ri, 2] * spatial_scale)
        y2 = round(rois[ri, 3] * spatial_scale)
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        bin_w = roi_w / p
        bin_h = roi_h / p
        for ph in range(p):
            for pw in range(p):
                hs = int(np.floor(ph * bin_h)) + y1
                he = int(np.ceil((ph + 1) * bin_h)) + y1
                ws = int(np.floor(pw * bin_w)) + x1
                we = int(np.ceil((pw + 1) * bin_w)) + x1
                hs, he = min(max(hs, 0), h), min(max(he, 0), h)
                ws, we = min(max(ws, 0), w), min(max(we, 0), w)
                if he > hs and we > ws:
                    out[ri, ph, pw] = feat[hs:he, ws:we].reshape(-1, c).max(axis=0)
    return out
