"""The canonical Pascal VOC detection evaluator.

Rebuild of reference ``lib/datasets/voc_eval.py:~1-200`` (SURVEY.md #28):
parse annotations (with a pkl cache), sort detections by confidence, greedy
TP/FP matching at an IoU threshold (difficult gt boxes neither count nor
penalize), precision/recall, and ``voc_ap`` with both the 11-point
interpolated metric (VOC <= 2009) and the all-point metric.
"""

from __future__ import annotations

import os
import pickle
import xml.etree.ElementTree as ET

import numpy as np


def parse_rec(filename: str):
    """Parse a PASCAL VOC xml annotation file into a list of object dicts."""
    tree = ET.parse(filename)
    objects = []
    for obj in tree.findall("object"):
        obj_struct = {
            "name": obj.find("name").text,
            "pose": obj.find("pose").text if obj.find("pose") is not None else "",
            "truncated": int(obj.find("truncated").text)
            if obj.find("truncated") is not None else 0,
            "difficult": int(obj.find("difficult").text)
            if obj.find("difficult") is not None else 0,
        }
        bbox = obj.find("bndbox")
        obj_struct["bbox"] = [
            int(float(bbox.find("xmin").text)),
            int(float(bbox.find("ymin").text)),
            int(float(bbox.find("xmax").text)),
            int(float(bbox.find("ymax").text)),
        ]
        objects.append(obj_struct)
    return objects


def voc_ap(rec, prec, use_07_metric: bool = False):
    """Average precision from recall/precision curves.

    use_07_metric: 11-point interpolation (VOC <= 2009); else the all-point
    (area-under-curve with monotone precision envelope) metric.
    """
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            if np.sum(rec >= t) == 0:
                p = 0.0
            else:
                p = np.max(prec[rec >= t])
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])


def voc_eval(detpath, annopath, imagesetfile, classname, cachedir,
             ovthresh: float = 0.5, use_07_metric: bool = False,
             use_diff: bool = False):
    """PASCAL VOC detection evaluation for one class.

    detpath: template for the per-class results file (format: detpath %
    classname), each line ``image_id score x1 y1 x2 y2`` (1-based coords);
    annopath: template for xml annotations (annopath % image_id);
    imagesetfile: one image id per line.  Returns (rec, prec, ap).
    """
    os.makedirs(cachedir, exist_ok=True)
    cachefile = os.path.join(cachedir, "annots.pkl")
    with open(imagesetfile) as f:
        imagenames = [x.strip() for x in f.readlines() if x.strip()]

    if not os.path.isfile(cachefile):
        recs = {}
        for imagename in imagenames:
            recs[imagename] = parse_rec(annopath % imagename)
        with open(cachefile, "wb") as f:
            pickle.dump(recs, f)
    else:
        with open(cachefile, "rb") as f:
            recs = pickle.load(f)

    # per-image gt for this class
    class_recs = {}
    npos = 0
    for imagename in imagenames:
        R = [obj for obj in recs[imagename] if obj["name"] == classname]
        bbox = np.array([x["bbox"] for x in R])
        if use_diff:
            difficult = np.zeros(len(R)).astype(bool)
        else:
            difficult = np.array([x["difficult"] for x in R]).astype(bool)
        det = [False] * len(R)
        npos = npos + sum(~difficult)
        class_recs[imagename] = {"bbox": bbox, "difficult": difficult, "det": det}

    detfile = detpath % classname
    with open(detfile) as f:
        lines = f.readlines()
    splitlines = [x.strip().split(" ") for x in lines if x.strip()]
    image_ids = [x[0] for x in splitlines]
    confidence = np.array([float(x[1]) for x in splitlines])
    BB = np.array([[float(z) for z in x[2:]] for x in splitlines])

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)

    if BB.shape[0] > 0:
        sorted_ind = np.argsort(-confidence)
        BB = BB[sorted_ind, :]
        image_ids = [image_ids[x] for x in sorted_ind]

        for d in range(nd):
            R = class_recs[image_ids[d]]
            bb = BB[d, :].astype(float)
            ovmax = -np.inf
            BBGT = R["bbox"].astype(float)

            if BBGT.size > 0:
                ixmin = np.maximum(BBGT[:, 0], bb[0])
                iymin = np.maximum(BBGT[:, 1], bb[1])
                ixmax = np.minimum(BBGT[:, 2], bb[2])
                iymax = np.minimum(BBGT[:, 3], bb[3])
                iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
                ih = np.maximum(iymax - iymin + 1.0, 0.0)
                inters = iw * ih
                uni = (
                    (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                    + (BBGT[:, 2] - BBGT[:, 0] + 1.0) * (BBGT[:, 3] - BBGT[:, 1] + 1.0)
                    - inters
                )
                overlaps = inters / uni
                ovmax = np.max(overlaps)
                jmax = np.argmax(overlaps)

            if ovmax > ovthresh:
                if not R["difficult"][jmax]:
                    if not R["det"][jmax]:
                        tp[d] = 1.0
                        R["det"][jmax] = 1
                    else:
                        fp[d] = 1.0
            else:
                fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap = voc_ap(rec, prec, use_07_metric)
    return rec, prec, ap
