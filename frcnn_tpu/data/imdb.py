"""imdb: the abstract image-database base class.

Rebuild of reference ``lib/datasets/imdb.py:~1-280`` (SURVEY.md #25): lazy
roidb via a pluggable handler, pkl caching, horizontal-flip augmentation
(``append_flipped_images``: x1' = W - x2 - 1, doubling the roidb), roidb
merging, competition mode, and the ``evaluate_detections`` contract
(all_boxes[class][image] = (k, 5) [x1, y1, x2, y2, score]).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from frcnn_tpu.ops.boxes import bbox_overlaps


class imdb:
    def __init__(self, name: str, classes=None):
        self._name = name
        self._num_classes = 0
        self._classes = classes or []
        self._image_index = []
        self._obj_proposer = "gt"
        self._roidb = None
        self._roidb_handler = self.default_roidb
        self.config = {}

    # -- identity ------------------------------------------------------------
    @property
    def name(self):
        return self._name

    @property
    def num_classes(self):
        return len(self._classes)

    @property
    def classes(self):
        return self._classes

    @property
    def image_index(self):
        return self._image_index

    @property
    def num_images(self):
        return len(self.image_index)

    # -- roidb ---------------------------------------------------------------
    @property
    def roidb_handler(self):
        return self._roidb_handler

    @roidb_handler.setter
    def roidb_handler(self, val):
        self._roidb_handler = val

    def set_proposal_method(self, method: str):
        self._roidb_handler = getattr(self, method + "_roidb")

    @property
    def roidb(self):
        if self._roidb is None:
            self._roidb = self.roidb_handler()
        return self._roidb

    def default_roidb(self):
        raise NotImplementedError

    def gt_roidb(self):
        raise NotImplementedError

    @property
    def cache_path(self):
        from frcnn_tpu.config import cfg

        # honor a per-instance data dir (factory.get_imdb(data_dir=...),
        # i.e. CLI --set DATA_DIR) over the module default
        base = getattr(self, "_data_dir", None) or cfg.DATA_DIR
        path = osp.join(base, "cache")
        os.makedirs(path, exist_ok=True)
        return path

    # -- paths / sizes -------------------------------------------------------
    def image_path_at(self, i: int) -> str:
        raise NotImplementedError

    def image_id_at(self, i: int):
        return i

    def _get_widths(self):
        import cv2

        return [cv2.imread(self.image_path_at(i)).shape[1]
                for i in range(self.num_images)]

    # -- augmentation ---------------------------------------------------------
    def append_flipped_images(self):
        """Double the roidb with horizontally-flipped entries (reference
        append_flipped_images; called by get_training_roidb when
        cfg.TRAIN.USE_FLIPPED)."""
        num_images = self.num_images
        if all("width" in r for r in self.roidb):
            widths = [r["width"] for r in self.roidb]
        else:
            widths = self._get_widths()
        for i in range(num_images):
            boxes = self.roidb[i]["boxes"].copy()
            oldx1 = boxes[:, 0].copy()
            oldx2 = boxes[:, 2].copy()
            boxes[:, 0] = widths[i] - oldx2 - 1
            boxes[:, 2] = widths[i] - oldx1 - 1
            assert (boxes[:, 2] >= boxes[:, 0]).all()
            entry = {k: v for k, v in self.roidb[i].items()
                     if k not in ("boxes", "flipped")}
            entry["boxes"] = boxes
            entry["flipped"] = True
            self.roidb.append(entry)
        self._image_index = self._image_index * 2

    # -- evaluation -----------------------------------------------------------
    def evaluate_detections(self, all_boxes, output_dir=None):
        raise NotImplementedError

    def evaluate_recall(self, candidate_boxes=None, thresholds=None, area="all",
                        limit=None):
        """Proposal recall (reference evaluate_recall, simplified to
        area='all'): fraction of gt boxes matched at IoU thresholds."""
        if thresholds is None:
            thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05)
        gt_total = 0
        max_overlaps_all = []
        for i in range(self.num_images):
            entry = self.roidb[i]
            gt_inds = np.where(entry["gt_classes"] > 0)[0]
            gt_boxes = entry["boxes"][gt_inds]
            gt_total += len(gt_inds)
            if candidate_boxes is None:
                non_gt = np.where(entry["gt_classes"] == 0)[0]
                boxes = entry["boxes"][non_gt]
            else:
                boxes = candidate_boxes[i]
            if limit is not None:
                boxes = boxes[:limit]
            if boxes.shape[0] == 0 or gt_boxes.shape[0] == 0:
                continue
            ov = np.asarray(bbox_overlaps(boxes.astype(np.float32),
                                          gt_boxes.astype(np.float32)))
            max_overlaps_all.append(ov.max(axis=0))
        if gt_total == 0:
            return {"recalls": np.zeros_like(thresholds), "thresholds": thresholds,
                    "ar": 0.0, "gt_overlaps": np.zeros(0)}
        gt_overlaps = (np.concatenate(max_overlaps_all)
                       if max_overlaps_all else np.zeros(0))
        gt_overlaps = np.sort(gt_overlaps)
        recalls = np.array([(gt_overlaps >= t).sum() / float(gt_total)
                            for t in thresholds])
        ar = recalls.mean()
        return {"ar": ar, "recalls": recalls, "thresholds": thresholds,
                "gt_overlaps": gt_overlaps}

    def competition_mode(self, on: bool):
        """Dataset-specific eval-config toggle (VOC: use_salt/cleanup)."""

    @staticmethod
    def merge_roidbs(a, b):
        assert len(a) == len(b)
        for i in range(len(a)):
            a[i]["boxes"] = np.vstack((a[i]["boxes"], b[i]["boxes"]))
            a[i]["gt_classes"] = np.hstack((a[i]["gt_classes"], b[i]["gt_classes"]))
            a[i]["gt_overlaps"] = np.vstack((a[i]["gt_overlaps"], b[i]["gt_overlaps"]))
            a[i]["seg_areas"] = np.hstack((a[i]["seg_areas"], b[i]["seg_areas"]))
        return a
