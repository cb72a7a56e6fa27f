"""ctypes bindings for the C++ host ops, with numpy fallbacks.

Replaces the reference's Cython layer (``lib/nms/cpu_nms.pyx``,
``lib/utils/bbox.pyx`` — SURVEY.md #20/#21) for *host-side* consumers
(tools/reval.py, dataset utilities).  The device path never comes here —
it uses Pallas/XLA.  The library auto-builds with g++ on first use if the
.so is missing (reference ran lib/make.sh once at install).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import sys

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SO_NAMES = ("libfrcnn_host_ops.so",)
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    for name in _SO_NAMES:
        path = osp.join(_DIR, name)
        if not osp.exists(path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     osp.join(_DIR, "host_ops.cc"), "-o", path],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                continue
        try:
            lib = ctypes.CDLL(path)
            lib.frcnn_nms.restype = ctypes.c_int
            lib.frcnn_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
            lib.frcnn_bbox_overlaps.restype = None
            lib.frcnn_bbox_overlaps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            _lib = lib
            break
        except OSError:
            continue
    if _lib is None:
        # Loud, once: the numpy fallback is correct but slower; a silent
        # engage would hide a broken auto-build on a fresh checkout.
        print("frcnn_tpu.native.host_ops: C++ library unavailable "
              "(g++ build or dlopen failed) — using numpy fallback",
              file=sys.stderr)
    return _lib


def have_native() -> bool:
    return _load() is not None


def nms_cpu(dets, thresh: float):
    """Greedy NMS on (N, 5) [x1,y1,x2,y2,score] → kept indices (score order)."""
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    n = dets.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    lib = _load()
    if lib is not None:
        keep = np.zeros(n, np.int64)
        cnt = lib.frcnn_nms(
            dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(thresh), 0,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return keep[:cnt]
    # numpy fallback (classic greedy)
    x1, y1, x2, y2, scores = dets.T
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
        order = order[np.where(ovr <= thresh)[0] + 1]
    return np.asarray(keep, np.int64)


def bbox_overlaps_cpu(boxes, query):
    """Pairwise IoU (N, 4) x (K, 4) → (N, K)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    n, k = boxes.shape[0], query.shape[0]
    lib = _load()
    if lib is not None:
        out = np.zeros((n, k), np.float32)
        lib.frcnn_bbox_overlaps(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    bx = boxes[:, None, :]
    qx = query[None, :, :]
    iw = np.minimum(bx[..., 2], qx[..., 2]) - np.maximum(bx[..., 0], qx[..., 0]) + 1
    ih = np.minimum(bx[..., 3], qx[..., 3]) - np.maximum(bx[..., 1], qx[..., 1]) + 1
    iw = np.maximum(iw, 0)
    ih = np.maximum(ih, 0)
    inter = iw * ih
    ab = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    aq = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    union = ab[:, None] + aq[None, :] - inter
    return np.where(inter > 0, inter / union, 0.0).astype(np.float32)
