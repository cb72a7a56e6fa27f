"""roidb preparation (reference ``lib/roi_data_layer/roidb.py:~1-130``,
SURVEY.md #31): attach image paths/sizes and per-box max-overlap metadata."""

from __future__ import annotations

import numpy as np


def prepare_roidb(imdb):
    """Enrich imdb.roidb in place: image path, width/height, max_classes /
    max_overlaps per box (reference prepare_roidb; sizes via PIL/cv2 header
    read, cached on the entries)."""
    sizes = _image_sizes(imdb)
    roidb = imdb.roidb
    for i in range(len(roidb)):
        roidb[i]["image"] = imdb.image_path_at(i)
        roidb[i]["height"], roidb[i]["width"] = sizes[i]
        gt_overlaps = roidb[i]["gt_overlaps"]
        max_overlaps = gt_overlaps.max(axis=1) if len(gt_overlaps) else np.zeros(0)
        max_classes = gt_overlaps.argmax(axis=1) if len(gt_overlaps) else np.zeros(0, np.int32)
        roidb[i]["max_classes"] = max_classes
        roidb[i]["max_overlaps"] = max_overlaps
        # sanity (reference asserts the same invariants)
        zero_inds = np.where(max_overlaps == 0)[0]
        assert all(max_classes[zero_inds] == 0)
        nonzero_inds = np.where(max_overlaps > 0)[0]
        assert all(max_classes[nonzero_inds] != 0)


def _image_sizes(imdb):
    """(h, w) per roidb entry; flipped entries reuse the original size."""
    import cv2

    n = imdb.num_images
    base = []
    cache = {}
    for i in range(n):
        path = imdb.image_path_at(i)
        if path not in cache:
            im = cv2.imread(path)
            assert im is not None, f"failed to read {path}"
            cache[path] = im.shape[:2]
        base.append(cache[path])
    reps = (len(imdb.roidb) + n - 1) // n
    return (base * reps)[: len(imdb.roidb)]
